"""Optimizer factory on optax.

Parity target: reference ``create_optimizer``
(``doc2tex/modules/optim/builder.py:48-96``): adam / adamw / adadelta /
adagrad / lamb / madgrad / adamp (+ optional ``lookahead_`` prefix wrapper),
with ``add_weight_decay`` exempting biases and 1-D params from decay
(``builder.py:13-26``, enabled by ``filter_bias_and_bn``).

TPU-native: everything is an optax GradientTransformation composed with the
schedule, so the optimizer update runs inside the jitted, sharded train
step.  MADGRAD and AdamP (reference-vendored torch optimizers) are
implemented here directly on optax primitives.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


def _decay_mask(params) -> Any:
    """True where weight decay applies: ndim > 1 (reference add_weight_decay
    exempts biases/1-D tensors, builder.py:13-26)."""
    return jax.tree_util.tree_map(lambda p: p.ndim > 1, params)


class MadgradState(NamedTuple):
    count: jax.Array
    grad_sum: Any
    grad_sum_sq: Any
    x0: Any


def madgrad(
    learning_rate: Callable | float,
    momentum: float = 0.9,
    eps: float = 1e-6,
) -> optax.GradientTransformation:
    """MADGRAD (facebookresearch/madgrad; reference vendored
    ``doc2tex/modules/optim/madgrad.py``) as an optax transform."""

    def init(params):
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        return MadgradState(
            jnp.zeros([], jnp.int32),
            zeros,
            jax.tree_util.tree_map(jnp.zeros_like, params),
            params,
        )

    def update(grads, state, params):
        if params is None:
            raise ValueError("madgrad requires params")
        k = state.count
        lr = learning_rate(k) if callable(learning_rate) else learning_rate
        lamb = lr * jnp.sqrt(k.astype(jnp.float32) + 1.0)

        grad_sum = jax.tree_util.tree_map(
            lambda s, g: s + lamb * g, state.grad_sum, grads
        )
        grad_sum_sq = jax.tree_util.tree_map(
            lambda s, g: s + lamb * g * g, state.grad_sum_sq, grads
        )

        def step(x0, gs, gss, p):
            rms = jnp.cbrt(gss) + eps
            z = x0 - gs / rms
            return momentum * p + (1 - momentum) * z

        new_params = jax.tree_util.tree_map(
            step, state.x0, grad_sum, grad_sum_sq, params
        )
        updates = jax.tree_util.tree_map(lambda n, p: n - p, new_params, params)
        return updates, MadgradState(k + 1, grad_sum, grad_sum_sq, state.x0)

    return optax.GradientTransformation(init, update)


class AdampState(NamedTuple):
    count: jax.Array
    mu: Any
    nu: Any


def adamp(
    learning_rate: Callable | float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    delta: float = 0.1,
    wd_ratio: float = 0.1,
    mask: Any = None,
) -> optax.GradientTransformation:
    """AdamP (clova; reference vendored ``doc2tex/modules/optim/adamp.py``):
    Adam whose update is projected onto the tangent space of
    scale-invariant weights (channel-wise) when the grad/param cosine
    similarity is below delta/sqrt(dim), with weight decay damped by
    wd_ratio on projected layers.  ``mask`` (bool pytree, True = decay)
    mirrors the reference's add_weight_decay grouping (builder.py:13-26)."""

    def init(params):
        z = jax.tree_util.tree_map(jnp.zeros_like, params)
        return AdampState(jnp.zeros([], jnp.int32), z,
                          jax.tree_util.tree_map(jnp.zeros_like, params))

    def _project(p, perturb):
        """Channel-wise projection (reference adamp.py:18-40)."""
        if p.ndim < 2:
            return perturb, 1.0
        view = (p.shape[0], -1) if p.ndim > 1 else (1, -1)
        pv = p.reshape(view)
        gv = perturb.reshape(view)
        dot = jnp.sum(pv * gv, axis=1)
        cos = jnp.abs(dot) / (
            jnp.linalg.norm(pv, axis=1) * jnp.linalg.norm(gv, axis=1) + eps
        )
        apply_proj = jnp.max(cos) < delta / np.sqrt(pv.shape[1])
        p_n = pv / (jnp.linalg.norm(pv, axis=1, keepdims=True) + eps)
        projected = gv - p_n * jnp.sum(p_n * gv, axis=1, keepdims=True)
        out = jnp.where(apply_proj, projected, gv).reshape(p.shape)
        wd = jnp.where(apply_proj, wd_ratio, 1.0)
        return out, wd

    def update(grads, state, params):
        if params is None:
            raise ValueError("adamp requires params")
        count = state.count + 1
        lr = learning_rate(state.count) if callable(learning_rate) else learning_rate
        bc1 = 1.0 - b1 ** count.astype(jnp.float32)
        bc2 = 1.0 - b2 ** count.astype(jnp.float32)
        mu = jax.tree_util.tree_map(lambda m, g: b1 * m + (1 - b1) * g,
                                    state.mu, grads)
        nu = jax.tree_util.tree_map(lambda v, g: b2 * v + (1 - b2) * g * g,
                                    state.nu, grads)

        def upd(p, m, v, decay):
            denom = jnp.sqrt(v) / jnp.sqrt(bc2) + eps
            step_size = lr / bc1
            perturb = m / denom
            perturb, wd = _project(p, perturb)
            new_p_delta = -step_size * perturb
            if weight_decay > 0 and decay:
                new_p_delta = new_p_delta - lr * weight_decay * wd * p
            return new_p_delta

        mask_tree = (
            mask
            if mask is not None
            else jax.tree_util.tree_map(lambda _: True, params)
        )
        updates = jax.tree_util.tree_map(upd, params, mu, nu, mask_tree)
        return updates, AdampState(count, mu, nu)

    return optax.GradientTransformation(init, update)


def create_optimizer(
    params,
    opt: str = "adamw",
    lr: float = 5e-4,
    weight_decay: float = 0.0,
    momentum: float = 0.9,
    filter_bias_and_bn: bool = True,
    schedule: Callable | None = None,
    grad_clip: float = 0.0,
    accum_grad: int = 1,
    **kwargs,
) -> optax.GradientTransformation:
    """Build the full update chain: clip -> optimizer(+decay mask) -> accum."""
    learning_rate = schedule if schedule is not None else lr
    mask = _decay_mask(params) if (filter_bias_and_bn and weight_decay) else None
    wd = weight_decay

    use_lookahead = opt.startswith("lookahead_")
    if use_lookahead:
        opt = opt[len("lookahead_"):]

    if opt == "adamw":
        tx = optax.adamw(learning_rate, weight_decay=wd, mask=mask)
    elif opt == "adam":
        tx = optax.adam(learning_rate)
    elif opt == "adamp":
        tx = adamp(learning_rate, weight_decay=wd, mask=mask)
    elif opt == "adadelta":
        tx = optax.adadelta(learning_rate)
    elif opt == "adagrad":
        tx = optax.adagrad(learning_rate)
    elif opt == "lamb":
        tx = optax.lamb(learning_rate, weight_decay=wd, mask=mask)
    elif opt == "madgrad":
        tx = madgrad(learning_rate, momentum=momentum)
    elif opt == "sgd":
        tx = optax.sgd(learning_rate, momentum=momentum)
    else:
        raise ValueError(f"unknown optimizer {opt!r}")

    chain = []
    if grad_clip and grad_clip > 0:
        chain.append(optax.clip_by_global_norm(grad_clip))
    chain.append(tx)
    tx = optax.chain(*chain)
    if use_lookahead:
        # reference wraps with timm Lookahead (optim/lookahead.py)
        tx = lookahead(tx, sync_period=6, slow_step_size=0.5)
    if accum_grad > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_grad)
    return tx


class LookaheadState(NamedTuple):
    count: jax.Array
    slow: Any
    inner: Any


def lookahead(
    inner: optax.GradientTransformation,
    sync_period: int = 6,
    slow_step_size: float = 0.5,
) -> optax.GradientTransformation:
    """timm-style Lookahead wrapper (reference ``optim/lookahead.py``):
    every ``sync_period`` inner steps, pull fast weights toward the slow
    copy by ``slow_step_size`` and reset fast = slow.  Self-contained (the
    optax built-in needs special param wrapping)."""

    def init(params):
        return LookaheadState(
            jnp.zeros([], jnp.int32), params, inner.init(params)
        )

    def update(grads, state, params):
        updates, inner_state = inner.update(grads, state.inner, params)
        count = state.count + 1
        sync = (count % sync_period) == 0

        def leaf(u, p, s):
            fast = p + u
            slow_new = s + slow_step_size * (fast - s)
            final = jnp.where(sync, slow_new - p, u)
            new_slow = jnp.where(sync, slow_new, s)
            return final, new_slow

        flat_u, treedef = jax.tree_util.tree_flatten(updates)
        flat_p = jax.tree_util.tree_leaves(params)
        flat_s = jax.tree_util.tree_leaves(state.slow)
        outs = [leaf(u, p, s) for u, p, s in zip(flat_u, flat_p, flat_s)]
        new_updates = jax.tree_util.tree_unflatten(treedef, [o[0] for o in outs])
        new_slow = jax.tree_util.tree_unflatten(treedef, [o[1] for o in outs])
        return new_updates, LookaheadState(count, new_slow, inner_state)

    return optax.GradientTransformation(init, update)


def optimizer_from_config(config, params):
    from .schedule import schedule_from_config

    oc = dict(config["optimizer"])
    schedule = schedule_from_config(config) if config.get("scheduler", True) else None
    return create_optimizer(
        params,
        opt=oc.get("opt", "adamw"),
        lr=oc.get("lr", 5e-4),
        weight_decay=oc.get("weight_decay", 0.0),
        momentum=oc.get("momentum", 0.9),
        filter_bias_and_bn=config.get("filter_bias_and_bn", True),
        schedule=schedule,
        grad_clip=config.get("grad_clip", 0.0),
        accum_grad=config.get("accum_grad", 1),
    )
