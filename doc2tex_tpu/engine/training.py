"""The training engine: init + iteration loop + validation/checkpoint cadence.

Parity target: reference ``doc2tex/engine/training.py`` (``init_training``
:20-92, ``train_one_step`` :94-165, ``validation`` :167-320) driven by the
``api/train.py:21-110`` loop: infinite bucketed iterator, loss log every
``logInterval``, validation + checkpoint every ``valInterval``, cosine LR,
early stop by patience, ``sanity_check`` single-step mode.

TPU-native: the train step is one compiled XLA program per bucket shape
(augment+forward+loss+backward+optim fused; see ``train/trainer.py``);
validation decodes greedily on device and computes token metrics on host.
"""

from __future__ import annotations

import contextlib
import os
import time
from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data.loader import build_loader
from ..models import Model, build_model
from ..tokenizer.converters import create_converter
from ..train.checkpoint import (
    BestCheckpointKeeper,
    load_checkpoint,
    load_pretrained_params,
)
from ..train.trainer import (
    TrainState,
    create_train_state,
    criterion_from_config,
    make_eval_step,
    make_train_step,
    param_count,
)
from ..utils import Averager, cal_elapsed_time, setup_logger, update_summary
from .inferencing import validation


@dataclass
class TrainingBundle:
    config: Config
    converter: Any
    model: Model
    state: TrainState
    tx: Any
    criterion: Any
    train_step: Any
    eval_step: Any
    start_iter: int
    resume_meta: Optional[dict] = None


def init_training(config, rng: Optional[jax.Array] = None) -> TrainingBundle:
    """Build converter, model, state, optimizer, compiled steps
    (reference ``engine/training.py:20-92``)."""
    rng = rng if rng is not None else jax.random.PRNGKey(config.get("manualSeed", 1111))
    converter = create_converter(config)
    config["num_class"] = converter.num_classes
    model = build_model(config, converter.num_classes)

    # init with the smallest bucket shape; shapes are static per bucket anyway
    h0, w0 = config["min_dimension"]
    state, tx = create_train_state(
        model, config, rng, (config["batch_size"], h0, w0, 1)
    )
    criterion = criterion_from_config(config)
    start_iter = 0
    resume_meta = None

    if config.get("resume_path"):
        try:
            state, meta = load_checkpoint(config["resume_path"], state)
            start_iter = int(meta.get("iter", int(state.step)))
            resume_meta = dict(meta)
        except Exception as e:  # fall back to fresh state (reference
            # model_utils.py:227-235 resume try/except)
            import logging

            logging.getLogger("doc2tex_tpu").warning(
                f"resume failed ({e}); starting fresh"
            )
    elif config.get("pretrained_weight"):
        params, stats = load_pretrained_params(
            config["pretrained_weight"], state.params
        )
        state = state._replace(params=params)

    train_step = make_train_step(model, criterion, tx, config)
    eval_step = make_eval_step(model, criterion, config)
    return TrainingBundle(
        config, converter, model, state, tx, criterion, train_step, eval_step,
        start_iter, resume_meta,
    )


def train(config, log_dir: str = "saved_models/run") -> dict:
    """Full training loop (reference ``api/train.py:21-110``).

    Returns the final metric dict (for tests / sanity checks).
    """
    logger = setup_logger(log_dir)
    try:  # persistent XLA compile cache across runs (per-bucket programs)
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    b = init_training(config)
    logger.info(
        f"model: {param_count(b.state.params)/1e6:.2f}M params, "
        f"num_class={b.converter.num_classes}"
    )
    # config dump (reference engine/training.py:64-71)
    with open(os.path.join(log_dir, "config.txt"), "w") as f:
        f.write(repr(dict(config)))

    train_loader, valid_loader = build_loader(
        config, b.converter, seed=config.get("manualSeed", 1111)
    )
    logger.info(
        f"train: {train_loader.num_samples} samples in {len(train_loader.table)}-"
        f"shape ladder, {train_loader.batches_per_epoch()} batches/epoch; "
        f"valid: {valid_loader.num_samples}"
    )
    if train_loader.batches_per_epoch() == 0:
        raise ValueError(
            "train loader yields 0 batches/epoch — every sample was "
            "dropped by bucket planning (too large for max_dimension, or "
            "no full batch with keep_smaller_batches=False)"
        )

    keeper = BestCheckpointKeeper(log_dir)
    if b.resume_meta:  # don't regress best_* gates on resume
        keeper.seed_best(b.resume_meta)
    loss_avg = Averager()
    state = b.state

    # data-parallel training when >1 device: params replicated, batches
    # sharded on the mesh's data axis (XLA inserts the gradient psum).
    # The reference's analog is the vestigial batch_size x num_gpu scaling
    # (api/train.py:161-162) that never actually wrapped the model.
    mesh = None
    n_data = 1
    if jax.device_count() > 1 and config.get("use_dp", True):
        from ..parallel import make_mesh
        from ..parallel.mesh import param_shardings

        mesh_shape = config.get("mesh_shape")
        mesh = make_mesh(mesh_shape if isinstance(mesh_shape, dict) else None)
        n_data = mesh.shape["data"]
        n_model = mesh.shape["model"]
        # dp: replicate; dp x tp: big matmul weights shard over "model"
        # (column-parallel, mesh.py:_param_spec) — the same shape-based rule
        # covers opt_state moments (they mirror param shapes).  Activation
        # boundaries are constrained via the activation_mesh context below.
        min_size = int(config.get("tp_min_size", 2**16))
        sh = param_shardings(state, mesh, min_size=min_size if n_model > 1 else 2**62)
        state = jax.tree_util.tree_map(jax.device_put, state, sh)
        logger.info(
            f"sharded training over {n_data}x{n_model} (data x model) devices"
        )

    go_id = type(b.converter).START()

    def place_batch(images, text):
        if mesh is None:
            return jnp.asarray(images), jnp.asarray(text)
        from ..parallel import shard_batch

        nb = images.shape[0]
        if nb % n_data:
            pad = n_data - nb % n_data
            images = np.pad(images, ((0, pad), (0, 0), (0, 0), (0, 0)),
                            constant_values=255)
            # pad rows are loss-masked (targets all PAD), but lead with [GO]
            # so the TFM family's key-padding mask never sees an all-PAD row
            # (GO==PAD==0 for the Attn family, so this is a no-op there)
            text = np.pad(text, ((0, pad), (0, 0)))
            text[nb:, 0] = go_id
        return shard_batch(images, mesh), shard_batch(text, mesh)
    rng = jax.random.PRNGKey(config.get("manualSeed", 1111) + 1)
    num_iter = config["num_iter"]
    val_interval = config["valInterval"]
    log_interval = config.get("logInterval", 100)
    early_stop = config.get("early_stop", num_iter)
    sanity = config.get("sanity_check", False)

    # one decode fn for every validation (re-building per call would
    # re-trace one decode program per bucket shape each valInterval)
    from ..decode.runner import make_decode_fn

    # validation decode rides the active mesh when one is up (batch sharded
    # over the data axis; config val_use_mesh=False opts out, e.g. when the
    # eval set is smaller than the data axis)
    val_mesh = mesh if config.get("val_use_mesh", True) else None
    _base_decode = make_decode_fn(b.model, config, beam_size=1, mesh=val_mesh)
    if val_mesh is None:
        val_decode_fn = _base_decode
    else:
        def val_decode_fn(variables, images):
            # ragged eval tails: pad to the data-axis multiple with white
            # images, trim the outputs back
            nb = images.shape[0]
            rem = nb % n_data
            if rem:
                images = jnp.pad(
                    jnp.asarray(images),
                    ((0, n_data - rem), (0, 0), (0, 0), (0, 0)),
                    constant_values=255,
                )
            toks, aux = _base_decode(variables, images)
            return toks[:nb], aux[:nb]

    best_val_step = 0
    last_metrics: dict = {}
    t_start = time.time()
    it = b.start_iter

    from ..parallel.mesh import activation_mesh
    from ..utils.profiling import StepTimer

    timer = StepTimer()
    seen_buckets: set = set()
    pending_losses: list = []
    data_iter = train_loader.infinite()
    # jit traces happen at first call per bucket shape, inside this context:
    # activation-boundary constraints (ViT blocks, vocab projections) are
    # baked against the active mesh
    with contextlib.ExitStack() as _stack:
        _stack.enter_context(activation_mesh(mesh))
        last_metrics = _train_loop(
            b, config, state, train_loader, valid_loader, data_iter, keeper,
            loss_avg, logger, log_dir, timer, seen_buckets, pending_losses,
            place_batch, rng, num_iter, val_interval, log_interval,
            early_stop, sanity, best_val_step, last_metrics, t_start, it,
            val_decode_fn,
        )

    for key, row in timer.summary().items():
        logger.info(f"bucket {key}: {row}")
    return last_metrics


def _train_loop(
    b, config, state, train_loader, valid_loader, data_iter, keeper,
    loss_avg, logger, log_dir, timer, seen_buckets, pending_losses,
    place_batch, rng, num_iter, val_interval, log_interval, early_stop,
    sanity, best_val_step, last_metrics, t_start, it, val_decode_fn,
):
    while it < num_iter:
        batch = next(data_iter)
        # sync only on a bucket's first step (isolates compile time) and at
        # log boundaries — a per-step host sync would serialize the loop
        # (the device queue otherwise overlaps host data prep with compute)
        first = batch.bucket not in seen_buckets
        seen_buckets.add(batch.bucket)
        sync = first or ((it + 1) % log_interval == 0) or sanity
        with timer.step(batch.bucket) if sync else contextlib.nullcontext():
            images_d, text_d = place_batch(batch.images, batch.text)
            state, metrics = b.train_step(state, images_d, text_d, rng)
            if sync:
                metrics["loss"].block_until_ready()
        it += 1
        pending_losses.append(metrics["loss"])

        if it % log_interval == 0 or sanity:
            for x in pending_losses:
                loss_avg.add(float(x))
            pending_losses.clear()
            logger.info(
                f"[{it}/{num_iter}] loss: {loss_avg.val():.5f} "
                f"bucket: {batch.bucket} elapsed: "
                f"{cal_elapsed_time(time.time() - t_start)}"
            )
            loss_avg.reset()

        if it % val_interval == 0 or sanity or it == num_iter:
            val = validation(
                b.model, state, b.converter, valid_loader, config,
                eval_step=b.eval_step, decode_fn=val_decode_fn,
                max_batches=(1 if sanity else None),
                export_csv=(
                    os.path.join(log_dir, f"preds_iter{it}.csv")
                    if config.get("export_csv") else None
                ),  # per-validation CSV (reference inferencing.py:34-42)
            )
            last_metrics = val
            logger.info(
                f"validation @ {it}: loss {val['loss']:.4f} "
                f"acc {val['accuracy']:.4f} bleu {val['bleu']:.4f} "
                f"ED {val['ED']:.4f} wordED {val['word_ED']:.4f}"
            )
            for line in val.get("worst", [])[:5]:
                logger.info(f"  worst: {line}")
            update_summary(
                it,
                {k: v for k, v in val.items() if isinstance(v, (int, float))},
                os.path.join(log_dir, "summary.csv"),
            )
            saved = keeper.update(state, it, val)
            if "best_bleu.msgpack" in saved or "best_accuracy.msgpack" in saved:
                best_val_step = it
            elif it - best_val_step >= early_stop:
                logger.info(f"early stop at {it} (no improvement since {best_val_step})")
                break

        if sanity:
            logger.info("sanity check complete")
            break

    return last_metrics
