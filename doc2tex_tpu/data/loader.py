"""Host-side data pipeline: dataset -> buckets -> prefetched device batches.

Parity targets (reference):
- ``Im2LaTeXDataset`` length filtering + size clustering
  (``doc2tex/data/torch_dataset.py:11-72``)
- ``ClusterRandomSampler`` batch assembly (``doc2tex/data/sampler.py:14-48``)
- ``ClusterCollate`` per-image geometric augmentation p=0.5
  (``doc2tex/data/collate_fn.py:9-47``)
- ``PrefetchLoader`` overlapped H2D copy (``doc2tex/data/prefetcher.py:16-42``)
- ``build_loader`` wiring (``doc2tex/data/builder.py:9-42``)

TPU-native differences: batches are padded to a static bucket ladder (see
``buckets.py``) so the XLA compile count is bounded; label encoding happens
on host into fixed-width int32 arrays; a background thread assembles the
next batches while the device computes (the H2D overlap the reference got
from CUDA side streams comes for free from JAX async dispatch).
"""

from __future__ import annotations

import os
import queue
import threading
from dataclasses import dataclass
from typing import Iterator, Optional, Protocol, Sequence

import numpy as np

from ..tokenizer.converters import _BaseConverter
from ..transforms.geometry import geometry_transform
from .buckets import BucketTable, batch_plan, pad_to_bucket, plan_buckets


class Dataset(Protocol):
    """0-based sample access."""

    def __len__(self) -> int: ...
    def image(self, i: int) -> np.ndarray: ...
    def label(self, i: int) -> str: ...
    def size(self, i: int) -> tuple[int, int]: ...
    def name(self, i: int) -> str: ...


class ArrayDataset:
    """In-memory dataset (synthetic data, tests)."""

    def __init__(
        self,
        images: Sequence[np.ndarray],
        labels: Sequence[str],
        names: Optional[Sequence[str]] = None,
    ):
        self.images, self.labels = list(images), list(labels)
        self.names = list(names) if names else [str(i) for i in range(len(images))]

    def __len__(self) -> int:
        return len(self.images)

    def image(self, i: int) -> np.ndarray:
        return self.images[i]

    def label(self, i: int) -> str:
        return self.labels[i]

    def size(self, i: int) -> tuple[int, int]:
        return self.images[i].shape[:2]

    def name(self, i: int) -> str:
        return self.names[i]


class LmdbDataset:
    """0-based adapter over the 1-based LmdbReader."""

    def __init__(self, root: str, rgb: bool = False):
        from .lmdb_reader import LmdbReader

        self.reader = LmdbReader(root, rgb=rgb)

    def __len__(self) -> int:
        return len(self.reader)

    def image(self, i: int) -> np.ndarray:
        return self.reader.image(i + 1)

    def label(self, i: int) -> str:
        return self.reader.label(i + 1)

    def size(self, i: int) -> tuple[int, int]:
        return self.reader.size(i + 1)

    def name(self, i: int) -> str:
        return self.reader.name(i + 1)


@dataclass
class Batch:
    bucket: tuple[int, int]
    images: np.ndarray    # (B, H, W, 1) uint8
    text: np.ndarray      # (B, L+2) int32 encoded labels
    lengths: np.ndarray   # (B,) int32
    labels: list[str]
    names: list[str]


class BucketLoader:
    """Bucketed epoch iterator with background prefetch.

    One instance = one split.  ``__iter__`` yields ``Batch``es in shuffled
    order (train) or deterministic order (eval).
    """

    def __init__(
        self,
        dataset: Dataset,
        converter: _BaseConverter,
        config,
        train: bool = True,
        table: Optional[BucketTable] = None,
        seed: int = 0,
        prefetch: int = 2,
    ):
        self.dataset = dataset
        self.converter = converter
        self.config = config
        self.train = train
        self.batch_max_length = config["batch_max_length"]
        self.token_level = config.get("token_level", "word")
        self.rng = np.random.default_rng(seed)
        self.prefetch = prefetch
        workers = config.get("workers", 0) or 0
        if workers is None or workers < 0:
            workers = max((os.cpu_count() or 2) // 2, 1)
        if workers > 1:
            from concurrent.futures import ThreadPoolExecutor

            self._pool = ThreadPoolExecutor(max_workers=workers)
        else:
            self._pool = None

        # length filtering (reference torch_dataset.py:15-31)
        kept = []
        for i in range(len(dataset)):
            label = dataset.label(i)
            toks = label.split() if self.token_level == "word" else list(label)
            if len(toks) <= self.batch_max_length:
                kept.append(i)
        self.indices = kept

        sizes = [dataset.size(i) for i in kept]
        # over-padding augmentation applies to TRAIN splits only (the
        # eval contract stays native-bucket; see plan_buckets docstring)
        self.table, clusters, excluded = plan_buckets(
            sizes, config, table,
            overpad_rng=np.random.default_rng(seed + 17) if train else None,
        )
        # cluster keys are positions into `kept`; map back to dataset idx
        self.clusters = {
            b: [kept[j] for j in js] for b, js in clusters.items()
        }
        self.excluded = [kept[j] for j in excluded]
        self.num_samples = sum(len(v) for v in self.clusters.values())

    def _tokens(self, label: str) -> list[str]:
        return label.split() if self.token_level == "word" else list(label)

    def _prepare_one(self, i: int, bucket, aug_seed) -> np.ndarray:
        img = self.dataset.image(i)
        if img.ndim == 3:
            img = np.round(img.astype(np.float32).mean(-1)).astype(np.uint8)
        ds = self.config.get("downsample", 1) or 1
        if ds > 1:
            from ..transforms.preprocess import _resize_area

            img = _resize_area(img, *self._target_size(img.shape[:2]))
        if aug_seed is not None:
            # p=0.5 geometric augmentation (reference collate_fn.py:22-24)
            rng = np.random.default_rng(aug_seed)
            if rng.random() < 0.5:
                img = geometry_transform(img, rng)
        h = min(img.shape[0], bucket[0])
        w = min(img.shape[1], bucket[1])
        # pad_jitter (round 5): random top/left white margin before the
        # top-left-anchored bucket pad.  Detector crops arrive with
        # expansion margins on ALL sides (demo/app.py crop expansion) and
        # coalesced serving crops sit inside larger buckets; the flat
        # pos-embed only ever saw ink at (0, 0) — page_eval's oracle arm
        # measured that margin alone at -13 EM pts.  Train-time jitter
        # teaches margin invariance; eval/serving stay deterministic.
        jit = int(self.config.get("pad_jitter", 0) or 0) if self.train else 0
        if jit > 0:
            jr = np.random.default_rng(
                aug_seed if aug_seed is not None else 9176 + i
            )
            top = int(jr.integers(0, min(jit, bucket[0] - h) + 1))
            left = int(jr.integers(0, min(jit, bucket[1] - w) + 1))
            if top or left:
                img = np.pad(img[:h, :w], ((top, 0), (left, 0)),
                             constant_values=255)
                h, w = img.shape[:2]
        return pad_to_bucket(img[:h, :w], bucket)

    def _assemble(self, bucket: tuple[int, int], idxs: list[int]) -> Batch:
        imgs = np.empty((len(idxs), *bucket, 1), np.uint8)
        augment = self.train and self.config.get("augment", False)
        seeds = (
            [int(self.rng.integers(2**31)) for _ in idxs] if augment
            else [None] * len(idxs)
        )
        if self._pool is not None and len(idxs) > 2:
            # thread-pooled decode/augment/pad (the reference uses torch
            # DataLoader worker processes, data/builder.py:18)
            rows = list(
                self._pool.map(
                    lambda args: self._prepare_one(args[0], bucket, args[1]),
                    zip(idxs, seeds),
                )
            )
        else:
            rows = [self._prepare_one(i, bucket, s) for i, s in zip(idxs, seeds)]
        labels, names = [], []
        for row, (i, arr) in enumerate(zip(idxs, rows)):
            imgs[row, :, :, 0] = arr
            labels.append(self.dataset.label(i))
            names.append(self.dataset.name(i))
        text, lengths = self.converter.encode(
            [self._tokens(lb) for lb in labels], self.batch_max_length
        )
        return Batch(bucket, imgs, text, lengths, labels, names)

    def _target_size(self, hw: tuple[int, int]) -> tuple[int, int]:
        from .buckets import get_size

        return get_size(hw[0], hw[1], self.config)

    def batches_per_epoch(self) -> int:
        bs = self.config["batch_size"]
        keep = self.config.get("keep_smaller_batches", True)
        total = 0
        for idxs in self.clusters.values():
            q, r = divmod(len(idxs), bs)
            total += q + (1 if (r and keep) else 0)
        return total

    def __iter__(self) -> Iterator[Batch]:
        plan = batch_plan(
            self.clusters,
            self.config["batch_size"],
            keep_smaller_batches=self.config.get("keep_smaller_batches", True),
            rng=self.rng,
            shuffle=self.train,
        )
        if self.prefetch <= 0:
            for bucket, idxs in plan:
                yield self._assemble(bucket, idxs)
            return

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        SENTINEL = object()

        def producer():
            try:
                for bucket, idxs in plan:
                    q.put(self._assemble(bucket, idxs))
                q.put(SENTINEL)
            except BaseException as e:  # surface in the consumer, don't
                q.put(e)                # silently truncate the epoch

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is SENTINEL:
                break
            if isinstance(item, BaseException):
                raise item
            yield item

    def infinite(self) -> Iterator[Batch]:
        """Endless shuffled batches (reference api/train.py:46 infinite iterator)."""
        while True:
            n = 0
            for batch in self:
                n += 1
                yield batch
            if n == 0:
                # every sample was dropped by bucket planning (too large
                # for the ladder / no full batch with
                # keep_smaller_batches=False) — a bare `while True` here
                # busy-hangs the train loop with zero signal
                raise RuntimeError(
                    f"loader produced 0 batches from {self.num_samples} "
                    "samples: check max_dimension/batch_size/"
                    "keep_smaller_batches against the data"
                )


def build_loader(config, converter, seed: int = 0):
    """(train_loader, valid_loader) from config paths
    (reference ``doc2tex/data/builder.py:9-42``).

    ``train_data``/``valid_data`` point at LMDB roots; a missing path with
    ``synthetic_data: N`` set builds an in-memory synthetic split instead
    (hermetic tests / demo runs).  ``synthetic_style`` picks the
    generator: ``flat`` (default — one glyph per token),
    ``structured`` (nested frac/sqrt/matrix grammar), or ``hard`` (the
    round-3 benchmark: KaTeX-inventory vocab, multi-font glyphs, render
    noise — the regime the released recognizers were trained on; pair it
    with ``vocab: saved_models/math_recog/version2/vocab.txt``).
    """
    import os

    def split(key: str, train: bool):
        path = config.get(key)
        if path and os.path.isdir(path):
            ds = LmdbDataset(path, rgb=config.get("rgb", False))
        elif config.get("synthetic_data"):
            from . import synthetic as _synth

            style = str(config.get("synthetic_style") or "flat")
            gens = {
                "flat": _synth.synth_dataset,
                "structured": _synth.synth_structured_dataset,
                "hard": _synth.synth_hard_dataset,
            }
            if style not in gens:
                raise ValueError(
                    f"synthetic_style {style!r}: pick one of {sorted(gens)}"
                )
            n = int(config["synthetic_data"])
            kwargs = dict(config.get("synthetic_kwargs") or {})
            images, labels = gens[style](
                n if train else max(n // 10, 4),
                seed=seed if train else seed + 1,
                **kwargs,
            )
            ds = ArrayDataset(images, labels)
        else:
            raise FileNotFoundError(f"{key}: {path!r} not found")
        return BucketLoader(
            ds, converter, config, train=train, seed=seed
        )

    return split("train_data", True), split("valid_data", False)
