"""Losses: cross entropy + label smoothing with ignore-index masking.

Parity targets: reference criterion factory
(``doc2tex/modules/loss/builder.py:18-24``, 'entropy' -> CrossEntropyLoss,
'smooth' -> LabelSmoothingLoss) with ``ignore_index`` forced to the
converter's pad id (``doc2tex/engine/training.py:51``), and the manual
smoothed-NLL of ``doc2tex/modules/loss/labelsmoothing.py:5-30``.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def cross_entropy_loss(
    logits: jax.Array,       # (..., V)
    targets: jax.Array,      # (...) int
    ignore_index: int = 0,
) -> jax.Array:
    """Mean CE over non-ignored positions (torch CrossEntropyLoss semantics
    with ignore_index + mean reduction)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    mask = (targets != ignore_index).astype(jnp.float32)
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def label_smoothing_loss(
    logits: jax.Array,
    targets: jax.Array,
    smoothing: float = 0.1,
    ignore_index: int = 0,
) -> jax.Array:
    """Smoothed NLL with padding mask (reference labelsmoothing.py:5-30)."""
    V = logits.shape[-1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    confidence = 1.0 - smoothing
    low = smoothing / (V - 1)
    true_dist = jnp.full_like(logp, low)
    true_dist = jnp.where(
        jax.nn.one_hot(targets, V, dtype=bool), confidence, true_dist
    )
    loss = -(true_dist * logp).sum(axis=-1)
    mask = (targets != ignore_index).astype(jnp.float32)
    return jnp.sum(loss * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def create_criterion(name: str, ignore_index: int, **kwargs) -> Callable:
    """'entropy' | 'smooth' factory (reference loss/builder.py:18-24)."""
    if name == "entropy":
        return lambda logits, targets: cross_entropy_loss(
            logits, targets, ignore_index=ignore_index
        )
    if name == "smooth":
        smoothing = kwargs.get("smoothing", 0.1)
        return lambda logits, targets: label_smoothing_loss(
            logits, targets, smoothing=smoothing, ignore_index=ignore_index
        )
    raise ValueError(f"unknown criterion {name!r}")
