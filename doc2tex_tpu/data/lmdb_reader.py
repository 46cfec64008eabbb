"""LMDB dataset reader.

Same on-disk schema as the reference store
(``doc2tex/data/lmdb_dataset.py:12-101`` and the writer
``doc2tex/tools/lmdb_builders/create_lmdb_dataset.py:36-98``):
keys ``image-%09d`` (encoded image bytes), ``label-%09d`` (utf-8),
``name-%09d`` (utf-8), ``height-%09d``/``width-%09d`` (int32 bytes),
``num-samples``; indices start at 1.

Backend: the ``lmdb`` C package when installed; otherwise the pure-Python
MDB file-format implementation in ``pylmdb.py`` (reads reference-produced
stores and round-trips writes without the C library).
"""

from __future__ import annotations

import io
from typing import Sequence

import numpy as np

try:
    import lmdb  # C library via pip package, same dep as the reference

    HAS_LMDB = True
except ImportError:  # pragma: no cover
    lmdb = None
    HAS_LMDB = False

try:
    from PIL import Image

    HAS_PIL = True
except ImportError:  # pragma: no cover
    Image = None
    HAS_PIL = False


KEY_IMAGE = "image-%09d"
KEY_LABEL = "label-%09d"
KEY_NAME = "name-%09d"
KEY_HEIGHT = "height-%09d"
KEY_WIDTH = "width-%09d"
KEY_NUM_SAMPLES = "num-samples"


class _PyTxn:
    """txn-shaped adapter over the pure-Python reader."""

    def __init__(self, root: str):
        from .pylmdb import PyLmdbReader

        self._r = PyLmdbReader(root)

    def get(self, key: bytes):
        return self._r.get(key)


class LmdbReader:
    """Read-only LMDB env with the reference key schema.

    Uses the ``lmdb`` C package when available (same dep as the
    reference), else the pure-Python MDB parser (``pylmdb.py``).
    """

    def __init__(self, root: str, rgb: bool = False):
        self.root = root
        self.rgb = rgb
        if HAS_LMDB:
            self.env = lmdb.open(
                root,
                max_readers=32,
                readonly=True,
                lock=False,
                readahead=False,
                meminit=False,
            )
            self.txn = self.env.begin(write=False)
        else:
            self.env = None
            self.txn = _PyTxn(root)
        self.num_samples = int(self.txn.get(KEY_NUM_SAMPLES.encode()))

    def __len__(self) -> int:
        return self.num_samples

    def label(self, idx: int) -> str:
        """1-based index, like the reference."""
        return self.txn.get((KEY_LABEL % idx).encode()).decode("utf-8")

    def name(self, idx: int) -> str:
        raw = self.txn.get((KEY_NAME % idx).encode())
        return raw.decode("utf-8") if raw is not None else str(idx)

    def size(self, idx: int) -> tuple[int, int]:
        """(h, w) from the int32 sidecar keys — avoids decoding the image
        during bucket planning (the reference's startup hot spot,
        ``torch_dataset.py:33-44``)."""
        h = np.frombuffer(self.txn.get((KEY_HEIGHT % idx).encode()), dtype=np.int32)
        w = np.frombuffer(self.txn.get((KEY_WIDTH % idx).encode()), dtype=np.int32)
        return int(h[0]), int(w[0])

    def image(self, idx: int) -> np.ndarray:
        """Decode image bytes to uint8 (H, W) grayscale or (H, W, 3)."""
        if not HAS_PIL:
            raise ImportError("PIL required to decode LMDB images")
        buf = io.BytesIO(self.txn.get((KEY_IMAGE % idx).encode()))
        try:
            img = Image.open(buf).convert("RGB" if self.rgb else "L")
        except (IOError, OSError):
            # corrupted-image dummy fallback (reference lmdb_dataset.py:62-74)
            img = Image.new("RGB" if self.rgb else "L", (32, 32), color=255)
        return np.asarray(img, dtype=np.uint8)

    def all_sizes(self) -> list[tuple[int, int]]:
        return [self.size(i + 1) for i in range(self.num_samples)]


def write_lmdb(
    out_path: str,
    images: Sequence[np.ndarray],
    labels: Sequence[str],
    names: Sequence[str] | None = None,
    map_size: int = 1 << 32,
) -> None:
    """Create an LMDB store with the reference schema
    (``create_lmdb_dataset.py:36-98``): PNG-encoded image bytes + label +
    name + int32 h/w, batched writes, ``num-samples`` key.

    Falls back to the pure-Python MDB writer when the C package is absent.
    """
    if not HAS_PIL:
        raise ImportError("PIL required to write LMDB datasets")
    if not HAS_LMDB:
        _write_lmdb_pure(out_path, images, labels, names, map_size)
        return
    env = lmdb.open(out_path, map_size=map_size)
    cache: dict[bytes, bytes] = {}
    n = 0
    with env.begin(write=True) as txn:
        for i, (img, label) in enumerate(zip(images, labels)):
            idx = i + 1
            buf = io.BytesIO()
            Image.fromarray(img).save(buf, format="PNG")
            h, w = img.shape[:2]
            cache[(KEY_IMAGE % idx).encode()] = buf.getvalue()
            cache[(KEY_LABEL % idx).encode()] = label.encode("utf-8")
            name = names[i] if names is not None else f"sample-{idx}"
            cache[(KEY_NAME % idx).encode()] = name.encode("utf-8")
            cache[(KEY_HEIGHT % idx).encode()] = np.int32(h).tobytes()
            cache[(KEY_WIDTH % idx).encode()] = np.int32(w).tobytes()
            n += 1
            if len(cache) >= 1000:
                for k, v in cache.items():
                    txn.put(k, v)
                cache.clear()
        cache[KEY_NUM_SAMPLES.encode()] = str(n).encode()
        for k, v in cache.items():
            txn.put(k, v)
    env.close()


def _write_lmdb_pure(out_path, images, labels, names, map_size) -> None:
    """Reference-schema store via the pure-Python MDB writer."""
    from .pylmdb import write_pylmdb

    pairs: list[tuple[bytes, bytes]] = []
    n = 0
    for i, (img, label) in enumerate(zip(images, labels)):
        idx = i + 1
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="PNG")
        h, w = img.shape[:2]
        pairs.append(((KEY_IMAGE % idx).encode(), buf.getvalue()))
        pairs.append(((KEY_LABEL % idx).encode(), label.encode("utf-8")))
        name = names[i] if names is not None else f"sample-{idx}"
        pairs.append(((KEY_NAME % idx).encode(), name.encode("utf-8")))
        pairs.append(((KEY_HEIGHT % idx).encode(), np.int32(h).tobytes()))
        pairs.append(((KEY_WIDTH % idx).encode(), np.int32(w).tobytes()))
        n += 1
    pairs.append((KEY_NUM_SAMPLES.encode(), str(n).encode()))
    write_pylmdb(out_path, pairs, map_size=map_size)
