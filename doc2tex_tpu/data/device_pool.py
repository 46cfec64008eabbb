"""Device-resident sample pools: zero-host-input training steps.

TPU-native data path for remote/tunneled devices where per-step host
transfers dominate (measured here: ~0.4 s per transfer, so host-fed
batches cap training below 1 step/s, while one big pool upload moves
~60 MB/s).  Each bucket's padded samples are uploaded ONCE; the jitted
step samples batch indices on device from a folded PRNG, so the steady
-state loop issues nothing but async execute calls (23-34 steps/s
measured vs <1 host-fed).

The pools ride as jit ARGUMENTS — closing over device arrays would embed
them as HLO constants and blow the remote-compile request-size cap
(see BASELINE.md env note).

Usage:
    pools = build_device_pools(loader, converter, config)
    step = make_pool_step(train_step, batch_size)
    for bucket in schedule:
        state, key, loss = step(state, key, pools[bucket].images,
                                pools[bucket].text)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class DevicePool(NamedTuple):
    bucket: tuple[int, int]
    images: jax.Array  # (N, H, W, 1) uint8 on device
    text: jax.Array    # (N, L) int32 on device
    n: int


def build_device_pools(loader, converter, config, min_samples=None):
    """Upload every bucket's padded samples to the device.

    ``loader``: a BucketLoader (supplies clusters + per-sample prep).
    Buckets with fewer than ``min_samples`` (default: batch_size) samples
    are skipped.  Host geometric augmentation is not applied (pixels are
    frozen on device); the on-device augment in the train step still runs.
    """
    min_samples = min_samples or config["batch_size"]
    pools: list[DevicePool] = []
    for bucket, idxs in sorted(loader.clusters.items()):
        if len(idxs) < min_samples:
            continue
        imgs = np.stack(
            [loader._prepare_one(i, bucket, None) for i in idxs]
        )[..., None]
        text, _ = converter.encode(
            [loader._tokens(loader.dataset.label(i)) for i in idxs],
            config["batch_max_length"],
        )
        pools.append(
            DevicePool(
                bucket,
                jax.device_put(imgs),
                jax.device_put(np.asarray(text, np.int32)),
                len(idxs),
            )
        )
    return pools


def make_pool_step(train_step, batch_size: int):
    """Wrap a ``step(state, images, text, rng)`` train step so batches are
    sampled on device from a pool: ``fn(state, key, images_pool,
    text_pool) -> (state, key, loss)``."""

    @jax.jit
    def pool_step(state, key, images_pool, text_pool):
        key, sub, srng = jax.random.split(key, 3)
        idx = jax.random.randint(sub, (batch_size,), 0, images_pool.shape[0])
        state, metrics = train_step(
            state, images_pool[idx], text_pool[idx], srng
        )
        return state, key, metrics["loss"]

    return pool_step


def pool_schedule(pools, batch_size: int, rng: np.random.Generator):
    """Endless bucket-index schedule proportional to pool sizes."""
    base = np.concatenate(
        [
            np.full(max(p.n // batch_size, 1), i)
            for i, p in enumerate(pools)
        ]
    )
    while True:
        rng.shuffle(base)
        yield from base
