"""Size math and the static bucket-shape table (the XLA shape contract).

The reference handles variable-size formula images by grouping samples into
same-size clusters and batching within a cluster
(``doc2tex/data/torch_dataset.py:33-66`` + ``doc2tex/data/sampler.py:14-48``),
so a batch never needs padding.  On TPU every distinct image shape is a
distinct XLA compilation, so an unbounded set of exact-size clusters would
mean an unbounded compile count.

TPU-native design: samples are still grouped, but each group's images are
**padded with background pixels up to a bucket shape drawn from a small
static ladder** of (H, W) shapes.  The ladder is derived from the config's
min/max dimensions and scale factor, so the number of compiled programs is
bounded and known up front.  Background padding (white, 255) is benign for
printed math on white canvases — it is exactly what the reference's own
divisible-pad does at inference (``doc2tex/utils/data_utils.py:10-47``).

``get_divisible_size`` / ``get_size`` replicate the *intended* semantics of
the reference (``doc2tex/data/helpers.py:4-45``): snap to a multiple of
``scale_factor`` inside [min_dimension, max_dimension].  (The reference
helper has a latent UnboundLocalError when a side is already divisible, and
its call site swaps h/w — ``torch_dataset.py:43`` passes (h, w) into a
(w, h) signature.  We implement the straightforward h/w-correct behavior.)
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Iterable, Sequence

import numpy as np


def get_divisible_size(
    ori_h: float,
    ori_w: float,
    max_dimension: Sequence[int] | None = None,
    scale_factor: int = 32,
) -> tuple[int, int]:
    """Snap (h, w) up to multiples of scale_factor; snap down if that would
    exceed max_dimension.  Mirrors reference ``helpers.py:4-13``."""

    def snap(dim: float, limit: int | None) -> int:
        up = math.ceil(dim / scale_factor) * scale_factor
        if limit is not None and up > limit:
            down = math.floor(dim / scale_factor) * scale_factor
            return max(down, scale_factor)
        return max(up, scale_factor)

    new_h = snap(ori_h, max_dimension[0] if max_dimension else None)
    new_w = snap(ori_w, max_dimension[1] if max_dimension else None)
    return int(new_h), int(new_w)


def get_size(ori_h: float, ori_w: float, config) -> tuple[int, int]:
    """Target (h, w) for a raw image under the config's downsample / clamp
    rules.  Mirrors reference ``helpers.py:16-45`` (h/w-corrected)."""
    if config.get("downsample", 1) is None or config.get("downsample", 1) <= 1:
        return int(ori_h), int(ori_w)

    ds = config["downsample"]
    h, w = ori_h / ds, ori_w / ds
    min_dim, max_dim = config["min_dimension"], config["max_dimension"]
    sf = config.get("scale_factor", 32)

    new_h, new_w = get_divisible_size(h, w, scale_factor=sf)

    ratios = [new_h / max_dim[0], new_w / max_dim[1]]
    if any(r > 1 for r in ratios):
        scale = max(ratios)
        new_h, new_w = new_h / scale, new_w / scale
        new_h, new_w = get_divisible_size(new_h, new_w, max_dim, sf)

    ratios = [new_h / min_dim[0], new_w / min_dim[1]]
    if any(r < 1 for r in ratios):
        scale = max(ratios)
        new_h, new_w = new_h / scale, new_w / scale
        new_h, new_w = get_divisible_size(new_h, new_w, scale_factor=sf)

    return int(new_h), int(new_w)


@dataclass(frozen=True)
class BucketTable:
    """The static set of compiled (H, W) image shapes.

    ``shapes`` is sorted by area.  ``lookup(h, w)`` returns the smallest
    bucket that contains (h, w), or None if the image exceeds every bucket.
    """

    shapes: tuple[tuple[int, int], ...]
    _by_area: tuple[tuple[int, int], ...] = field(init=False, repr=False)

    def __post_init__(self):
        object.__setattr__(
            self, "_by_area", tuple(sorted(self.shapes, key=lambda s: (s[0] * s[1], s)))
        )

    def lookup(self, h: int, w: int) -> tuple[int, int] | None:
        for bh, bw in self._by_area:
            if h <= bh and w <= bw:
                return (bh, bw)
        return None

    def __len__(self) -> int:
        return len(self.shapes)


def make_ladder(
    min_dimension: Sequence[int],
    max_dimension: Sequence[int],
    scale_factor: int = 32,
    growth: float = 1.5,
) -> BucketTable:
    """Build a geometric (H, W) ladder bounded by min/max dims.

    Each axis grows by ~``growth``x per rung (snapped to scale_factor), so a
    448x960 test config yields ~4x5 = 20 shapes instead of the reference's
    up-to-420 exact clusters — a bounded compile count with <=~33% padding
    waste per axis.
    """

    def axis(lo: int, hi: int) -> list[int]:
        vals = [lo]
        v = float(lo)
        while vals[-1] < hi:
            v = v * growth
            snapped = min(int(math.ceil(v / scale_factor) * scale_factor), hi)
            if snapped > vals[-1]:
                vals.append(snapped)
        return vals

    hs = axis(min_dimension[0], max_dimension[0])
    ws = axis(min_dimension[1], max_dimension[1])
    shapes = tuple((h, w) for h in hs for w in ws)
    return BucketTable(shapes)


def make_exact_table(sizes: Iterable[tuple[int, int]]) -> BucketTable:
    """BucketTable from exact sizes (reference-style clustering)."""
    return BucketTable(tuple(sorted(set(sizes))))


def plan_buckets(
    sizes: Sequence[tuple[int, int]],
    config,
    table: BucketTable | None = None,
    overpad_rng: np.random.Generator | None = None,
) -> tuple[BucketTable, dict[tuple[int, int], list[int]], list[int]]:
    """Assign each sample (by target size) to a bucket.

    Returns (table, {bucket_shape: [sample_idx, ...]}, excluded_idxs).
    Replicates the include/exclude semantics of
    ``torch_dataset.py:46-66`` (samples outside [min,max] are dropped).

    Over-padding augmentation (round 5, pad-invariance): when
    ``overpad_rng`` is given and ``config['overpad_prob'] > 0``, each
    sample is, with that probability, PROMOTED to a random larger ladder
    bucket whose area is <= ``config['overpad_ratio']`` x its native
    bucket's (top-left anchored white pad, exactly what serving's bucket
    coalescing does to a crop).  The round-4 coalesce EM gate failed
    because the flat pos-embed never saw a crop at pad positions beyond
    its native bucket; this teaches it.
    """
    overpad_prob = float(config.get("overpad_prob", 0.0) or 0.0)
    overpad_ratio = float(config.get("overpad_ratio", 4.0) or 4.0)
    if table is None:
        if config.get("bucket_mode", "ladder") == "ladder":
            table = make_ladder(
                config["min_dimension"],
                config["max_dimension"],
                config.get("scale_factor", 32),
                growth=config.get("bucket_growth", 1.5),
            )
        else:
            table = make_exact_table(
                get_size(h, w, config) for h, w in sizes
            )
    clusters: dict[tuple[int, int], list[int]] = {}
    excluded: list[int] = []
    for i, (h, w) in enumerate(sizes):
        th, tw = get_size(h, w, config)
        bucket = table.lookup(th, tw)
        if bucket is None:
            excluded.append(i)
            continue
        if (overpad_rng is not None and overpad_prob > 0.0
                and overpad_rng.random() < overpad_prob):
            area = bucket[0] * bucket[1]
            bigger = [
                b for b in table.shapes
                if b != bucket and b[0] >= bucket[0] and b[1] >= bucket[1]
                and b[0] * b[1] <= overpad_ratio * area
            ]
            if bigger:
                bucket = bigger[int(overpad_rng.integers(len(bigger)))]
        clusters.setdefault(bucket, []).append(i)
    return table, clusters, excluded


def pad_to_bucket(
    img: np.ndarray, bucket: tuple[int, int], pad_value: int = 255
) -> np.ndarray:
    """Pad an (H, W) or (H, W, C) uint8 image with background up to the
    bucket shape (top-left anchored, like the reference's divisible-pad at
    ``data_utils.py:10-47``)."""
    h, w = img.shape[:2]
    bh, bw = bucket
    if h > bh or w > bw:
        raise ValueError(f"image {img.shape} exceeds bucket {bucket}")
    pad = [(0, bh - h), (0, bw - w)] + [(0, 0)] * (img.ndim - 2)
    return np.pad(img, pad, mode="constant", constant_values=pad_value)


def batch_plan(
    clusters: dict[tuple[int, int], list[int]],
    batch_size: int,
    keep_smaller_batches: bool = True,
    rng: np.random.Generator | None = None,
    shuffle: bool = True,
) -> list[tuple[tuple[int, int], list[int]]]:
    """Emit (bucket_shape, sample_indices) batches.

    Mirrors the reference sampler (``doc2tex/data/sampler.py:14-48``):
    shuffle within each cluster, chunk into batches, optionally drop
    ragged tails, then shuffle the batch order.
    """
    rng = rng or np.random.default_rng()
    batches: list[tuple[tuple[int, int], list[int]]] = []
    for bucket, idxs in clusters.items():
        idxs = list(idxs)
        if shuffle:
            rng.shuffle(idxs)
        for s in range(0, len(idxs), batch_size):
            chunk = idxs[s : s + batch_size]
            if len(chunk) < batch_size and not keep_smaller_batches:
                continue
            batches.append((bucket, chunk))
    if shuffle:
        rng.shuffle(batches)
    return batches
