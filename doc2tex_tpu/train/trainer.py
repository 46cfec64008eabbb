"""Training state + the compiled train/eval steps.

Parity target: reference engine loop (``doc2tex/engine/training.py:20-162``
``init_training`` / ``forward_step`` / ``train_one_step``): teacher-forced
forward on ``text[:, :-1]`` vs targets ``text[:, 1:]``, CE loss with pad
ignore, grad-clip 5, AMP, grad accumulation, per-step cosine LR.

TPU-native inversion: the whole update — augmentation hook, forward,
loss, backward, clip, optimizer, LR schedule — is ONE jitted XLA program
per bucket shape.  bf16 matmuls with f32 params/optimizer state replace
torch AMP; ``optax.MultiSteps`` replaces manual grad accumulation; data
parallelism is just batch-axis sharding on the inputs (XLA inserts the
gradient ``psum`` over ICI when the loss mean crosses the shard axis).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import Model
from ..transforms.augment import normalize, train_augment


class TrainState(NamedTuple):
    step: jax.Array          # () int32 — optimizer steps taken
    params: Any              # f32 parameter pytree
    batch_stats: Any         # BatchNorm running stats
    opt_state: Any


def init_model(
    model: Model,
    rng: jax.Array,
    image_shape: tuple[int, int, int, int],
    text_width: int,
):
    """Initialize variables with a dummy batch (shapes are static anyway).

    The init is jitted: eager flax init dispatches hundreds of tiny ops,
    which over the tunneled device (~2s/op) costs many minutes before any
    run starts; one compiled program makes it a single dispatch."""
    img = jnp.zeros(image_shape, jnp.float32)
    txt = jnp.zeros((image_shape[0], text_width), jnp.int32)
    p_rng, d_rng = jax.random.split(rng)

    @jax.jit
    def _init(p_rng, d_rng, img, txt):
        return model.init(
            {"params": p_rng, "dropout": d_rng}, img, txt, train=False
        )

    variables = _init(p_rng, d_rng, img, txt)
    return variables["params"], variables.get("batch_stats", {})


def create_train_state(
    model: Model,
    config,
    rng: jax.Array,
    image_shape: tuple[int, int, int, int],
) -> tuple[TrainState, optax.GradientTransformation]:
    from .optim import optimizer_from_config

    text_width = config["batch_max_length"] + 1  # encoded[:, :-1]
    params, batch_stats = init_model(model, rng, image_shape, text_width)
    tx = optimizer_from_config(config, params)
    opt_state = jax.jit(tx.init)(params)  # eager zeros-like = 2 ops/param
    return TrainState(jnp.int32(0), params, batch_stats, opt_state), tx


def param_count(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


def make_train_step(
    model: Model,
    criterion: Callable,
    tx: optax.GradientTransformation,
    config,
    augment: bool = True,
) -> Callable:
    """Build the jitted train step.

    step(state, images_u8, text, rng) -> (state, metrics)
      images_u8: (B, H, W, C) uint8 raw bucket-padded pixels
      text:      (B, L+2) int32 encoded labels (GO ... s PAD)

    The on-device augment + normalize (reference ``Math_Transform``,
    ``doc2tex/transform/math_transform.py:10-39``, applied inside
    ``train_one_step`` at ``engine/training.py:115-116``) runs fused into
    the same XLA program.
    """
    mean, std = config.get("mean", 0.5), config.get("std", 0.5)
    do_augment = augment and config.get("augment", False)

    def step_fn(state: TrainState, images, text, rng):
        aug_rng, drop_rng = jax.random.split(jax.random.fold_in(rng, state.step))
        x = images.astype(jnp.float32)
        if x.ndim == 3:
            x = x[..., None]
        if do_augment:
            x = train_augment(aug_rng, x, mean=mean, std=std)
        else:
            x = normalize(x, mean=mean, std=std)

        inp, tgt = text[:, :-1], text[:, 1:]

        def loss_fn(params):
            logits, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                x,
                inp,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": drop_rng},
            )
            loss = criterion(logits, tgt)
            return loss, (mutated.get("batch_stats", {}), logits)

        (loss, (new_stats, logits)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        pred = jnp.argmax(logits, axis=-1)
        mask = tgt != 0
        tok_acc = jnp.sum((pred == tgt) & mask) / jnp.maximum(jnp.sum(mask), 1)
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
            "token_acc": tok_acc,
        }
        return (
            TrainState(state.step + 1, new_params, new_stats, new_opt),
            metrics,
        )

    return jax.jit(step_fn, donate_argnums=(0,))


def make_eval_step(model: Model, criterion: Callable, config) -> Callable:
    """Teacher-forced validation loss + token accuracy (one XLA program).

    Mirrors reference ``validation_step`` (``doc2tex/engine/
    inferencing.py:12``) normalize-only transform path.
    """
    mean, std = config.get("mean", 0.5), config.get("std", 0.5)

    def step_fn(state: TrainState, images, text):
        x = images.astype(jnp.float32)
        if x.ndim == 3:
            x = x[..., None]
        x = normalize(x, mean=mean, std=std)
        inp, tgt = text[:, :-1], text[:, 1:]
        logits = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            x,
            inp,
            train=False,
        )
        loss = criterion(logits, tgt)
        pred = jnp.argmax(logits, axis=-1)
        mask = tgt != 0
        tok_acc = jnp.sum((pred == tgt) & mask) / jnp.maximum(jnp.sum(mask), 1)
        # per-sample loss for the reference's "worst predictions" log
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
        per_sample = jnp.sum(nll * mask, axis=-1) / jnp.maximum(
            jnp.sum(mask, axis=-1), 1
        )
        return {"loss": loss, "token_acc": tok_acc, "per_sample_loss": per_sample,
                "pred": pred}

    return jax.jit(step_fn)


def criterion_from_config(config) -> Callable:
    from .loss import create_criterion

    cc = dict(config.get("criterion", {"name": "entropy"}))
    name = cc.pop("name", "entropy")
    cc.pop("reduction", None)
    cc.pop("weight", None)
    cc.pop("loss_args", None)
    # ignore_index forced to the converter pad id (=0 for both families),
    # reference engine/training.py:51
    cc["ignore_index"] = 0
    ignore = cc.pop("ignore_index")
    return create_criterion(name, ignore, **{k: v for k, v in cc.items() if v is not None})
