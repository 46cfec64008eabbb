"""On-device batch augmentation + normalization (traced jnp, fused by XLA).

Parity target: reference ``Math_Transform``
(``doc2tex/transform/math_transform.py:10-39``): clamp -> /255 -> Kornia
RandomSharpness + RandomBrightness (each p=0.5) -> Normalize(mean, std),
executed on device inside the train step (``engine/training.py:115-116``).

Here the whole chain is pure jnp on the uint8 batch the host ships, so XLA
fuses it with the model's first conv — zero extra HBM round trips.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize(images: jax.Array, mean: float = 0.5, std: float = 0.5) -> jax.Array:
    """uint8/float (B,H,W,C) -> normalized f32 (reference val path,
    ``engine/inferencing.py:53-56``)."""
    x = images.astype(jnp.float32)
    x = jnp.clip(x, 0.0, 255.0) / 255.0
    return (x - mean) / std


def _sharpness(x: jax.Array, factor: jax.Array) -> jax.Array:
    """Kornia-style RandomSharpness: blend with a 3x3 smoothing kernel.
    x in [0,1], (B,H,W,C)."""
    kernel = jnp.array(
        [[1.0, 1.0, 1.0], [1.0, 5.0, 1.0], [1.0, 1.0, 1.0]], jnp.float32
    ) / 13.0
    blurred = jax.lax.conv_general_dilated(
        x,
        kernel[:, :, None, None],
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1],
    )
    f = factor.reshape(-1, 1, 1, 1)
    return jnp.clip(x + f * (x - blurred), 0.0, 1.0)


def train_augment(
    rng: jax.Array,
    images: jax.Array,
    mean: float = 0.5,
    std: float = 0.5,
    p: float = 0.5,
    brightness: float = 0.1,
    sharpness: float = 0.5,
) -> jax.Array:
    """Random sharpness + brightness (each applied with prob p per sample),
    then normalize."""
    B = images.shape[0]
    x = jnp.clip(images.astype(jnp.float32), 0.0, 255.0) / 255.0
    k1, k2, k3, k4 = jax.random.split(rng, 4)

    apply_sharp = jax.random.bernoulli(k1, p, (B,))
    sharp_f = jax.random.uniform(k2, (B,), minval=0.0, maxval=sharpness)
    x_sharp = _sharpness(x, sharp_f)
    x = jnp.where(apply_sharp.reshape(-1, 1, 1, 1), x_sharp, x)

    apply_bright = jax.random.bernoulli(k3, p, (B,))
    delta = jax.random.uniform(k4, (B,), minval=-brightness, maxval=brightness)
    x_bright = jnp.clip(x + delta.reshape(-1, 1, 1, 1), 0.0, 1.0)
    x = jnp.where(apply_bright.reshape(-1, 1, 1, 1), x_bright, x)

    return (x - mean) / std
