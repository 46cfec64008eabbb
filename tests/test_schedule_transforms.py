"""LR-schedule parity vs the reference math + transform unit tests."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from doc2tex_tpu.train.schedule import warmup_cosine_schedule


def reference_lr(epoch, lr, min_lr, warmup_epochs, epochs):
    """Reference adjust_learning_rate math (model_utils.py:99-117)."""
    if epoch < warmup_epochs:
        return lr * epoch / warmup_epochs
    return min_lr + (lr - min_lr) * 0.5 * (
        1.0 + math.cos(math.pi * (epoch - warmup_epochs) / (epochs - warmup_epochs))
    )


class TestScheduleParity:
    def test_matches_reference_within_horizon(self):
        base, mn, warm, total, spe = 5e-4, 1e-5, 5.0, 60.0, 5000
        sched = warmup_cosine_schedule(base, mn, warm, total, spe)
        for step in [0, 1, 100, 4999, 5000, 25000, 150000, 299999]:
            epoch = step / spe
            ours = float(sched(jnp.asarray(step)))
            ref = reference_lr(epoch, base, mn, warm, total)
            assert abs(ours - ref) < 1e-9, (step, ours, ref)

    def test_clamped_past_horizon(self):
        sched = warmup_cosine_schedule(5e-4, 1e-5, 5.0, 60.0, 100)
        past = float(sched(jnp.asarray(100 * 60 * 3)))  # 3x the horizon
        assert abs(past - 1e-5) < 1e-9  # held at min_lr, no re-rise

    def test_short_run_lr_never_pinned_to_zero(self):
        # regression (round-3 hard-soak pilot): num_iter < valInterval gave
        # total_epochs 0 -> clamped epoch stuck at 0 -> LR 0 for the whole
        # run, a silent no-train
        from doc2tex_tpu.train.schedule import schedule_from_config

        cfg = {
            "valInterval": 25000, "num_iter": 20000, "warmup_epochs": 1,
            "min_lr": 1e-4, "optimizer": {"lr": 1e-3},
        }
        sched = schedule_from_config(cfg)
        lrs = [float(sched(jnp.asarray(s))) for s in (100, 5000, 19999)]
        assert all(lr > 1e-6 for lr in lrs), lrs
        # and the LR actually rises through the (capped) warmup
        assert lrs[1] > lrs[0]


class TestTransforms:
    def test_train_augment_shapes_and_range(self):
        from doc2tex_tpu.transforms.augment import train_augment

        x = jnp.full((4, 16, 32, 1), 128.0)
        out = train_augment(jax.random.PRNGKey(0), x)
        assert out.shape == x.shape
        # normalized by (x/255 - .5)/.5 -> roughly in [-1, 1]
        assert float(jnp.abs(out).max()) <= 1.0 + 1e-5

    def test_geometry_preserves_canvas(self):
        from doc2tex_tpu.transforms.geometry import geometry_transform

        rng = np.random.default_rng(0)
        img = np.full((40, 80), 255, np.uint8)
        img[10:30, 20:60] = 0
        out = geometry_transform(img, rng)
        assert out.shape == img.shape
        assert (out < 128).any()  # glyph still present

    def test_resize_for_inference_divisible(self):
        from doc2tex_tpu.transforms.preprocess import resize_for_inference

        cfg = {"downsample": 2, "max_dimension": [448, 960],
               "min_dimension": [32, 32], "scale_factor": 32}
        img = np.full((137, 613), 255, np.uint8)
        out = resize_for_inference(img, cfg)
        assert out.shape[0] % 32 == 0 and out.shape[1] % 32 == 0
        assert out.shape[0] <= 448 and out.shape[1] <= 960


class TestCheckpointKeeper:
    def test_best_gating(self, tmp_path):
        from doc2tex_tpu.train.checkpoint import BestCheckpointKeeper
        from doc2tex_tpu.train.trainer import TrainState

        state = TrainState(
            jnp.int32(0), {"w": jnp.zeros((2, 2))}, {}, {"count": jnp.int32(0)}
        )
        keeper = BestCheckpointKeeper(str(tmp_path))
        s1 = keeper.update(state, 10, {"bleu": 0.5, "accuracy": 0.3})
        assert "best_bleu.msgpack" in s1 and "best_accuracy.msgpack" in s1
        # worse metrics -> only the last checkpoint
        s2 = keeper.update(state, 20, {"bleu": 0.4, "accuracy": 0.2})
        assert s2 == ["last_checkpoint.msgpack"]
        # bleu improves, accuracy does not
        s3 = keeper.update(state, 30, {"bleu": 0.6, "accuracy": 0.1})
        assert "best_bleu.msgpack" in s3 and "best_accuracy.msgpack" not in s3
