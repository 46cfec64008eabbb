"""Data loader, checkpoint, and engine smoke tests (CPU, 8 virtual devices)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from doc2tex_tpu.config import make_config
from doc2tex_tpu.data.loader import ArrayDataset, BucketLoader, build_loader
from doc2tex_tpu.data.synthetic import SYNTH_VOCAB, synth_dataset
from doc2tex_tpu.tokenizer.converters import AttnLabelConverter


def small_config(**kw):
    c = make_config(
        dict(
            max_dimension=[64, 256],
            min_dimension=[32, 32],
            batch_max_length=24,
            batch_size=4,
            augment=True,
            synthetic_data=24,
            synthetic_kwargs={"max_len": 15, "max_h": 60},
            FeatureExtraction={"name": "None"},
            SequenceModeling={
                "name": "ViT",
                "params": {
                    "backbone": {
                        "name": "resnet",
                        "input_channel": 1,
                        "output_channel": 64,
                        "gcb": False,
                    },
                    "fix_embed": True,
                    "input_channel": 1,
                    "patching_style": "2d",
                    "patch_size": [2, 2],
                    "depth": 2,
                    "num_heads": 4,
                    "hidden_size": 64,
                },
            },
            Prediction={
                "name": "Attnv2",
                "params": {
                    "seqmodel": "TFM",
                    "input_size": 64,
                    "hidden_size": 64,
                    "kernel_size": 2,
                    "kernel_dim": 32,
                    "embed_target": True,
                    "enc_init": True,
                    "attn_type": "coverage",
                    "droprate": 0.1,
                },
            },
            criterion={"name": "entropy"},
            optimizer={"opt": "adamw", "lr": 1e-3, "weight_decay": 1e-6},
            num_iter=4,
            valInterval=2,
            logInterval=2,
            dtype="float32",
            vocab="",
        )
    )
    c.update(kw)
    return c


@pytest.fixture(scope="module")
def conv():
    return AttnLabelConverter(SYNTH_VOCAB)


class TestBucketLoader:
    def test_batches_shapes_and_encoding(self, conv):
        cfg = small_config()
        images, labels = synth_dataset(20, seed=1, max_len=15, max_h=60)
        ds = ArrayDataset(images, labels)
        loader = BucketLoader(ds, conv, cfg, train=True, seed=0)
        batches = list(loader)
        assert batches, "no batches produced"
        total = 0
        for b in batches:
            assert b.images.dtype == np.uint8
            assert b.images.shape[1:3] == b.bucket
            assert b.images.shape[3] == 1
            assert b.text.shape == (b.images.shape[0], cfg["batch_max_length"] + 2)
            assert b.text[:, 0].tolist() == [0] * b.images.shape[0]  # GO
            total += b.images.shape[0]
        assert total == loader.num_samples

    def test_length_filtering(self, conv):
        cfg = small_config(batch_max_length=5)
        images, labels = synth_dataset(20, seed=1, max_len=15, max_h=60)
        ds = ArrayDataset(images, labels)
        loader = BucketLoader(ds, conv, cfg, train=True)
        for i in loader.indices:
            assert len(ds.label(i).split()) <= 5

    def test_eval_order_deterministic(self, conv):
        cfg = small_config()
        images, labels = synth_dataset(12, seed=2, max_len=15, max_h=60)
        ds = ArrayDataset(images, labels)
        loader = BucketLoader(ds, conv, cfg, train=False, prefetch=0)
        names1 = [n for b in loader for n in b.names]
        names2 = [n for b in loader for n in b.names]
        assert names1 == names2

    def test_build_loader_synthetic(self, conv):
        cfg = small_config()
        train_loader, valid_loader = build_loader(cfg, conv, seed=0)
        assert train_loader.num_samples > 0
        assert valid_loader.num_samples >= 0


class TestCheckpoint:
    def test_save_load_roundtrip(self, tmp_path, conv):
        from doc2tex_tpu.models import build_model
        from doc2tex_tpu.train.checkpoint import load_checkpoint, save_checkpoint
        from doc2tex_tpu.train.trainer import create_train_state

        cfg = small_config()
        model = build_model(cfg, conv.num_classes)
        state, tx = create_train_state(model, cfg, jax.random.PRNGKey(0), (2, 32, 64, 1))
        path = str(tmp_path / "ckpt.msgpack")
        save_checkpoint(path, state, {"iter": 42, "best_bleu": 0.5})
        restored, meta = load_checkpoint(path, state)
        assert meta["iter"] == 42
        a = jax.tree_util.tree_leaves(state.params)
        b = jax.tree_util.tree_leaves(restored.params)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_partial_pretrained_load(self, tmp_path, conv):
        from doc2tex_tpu.models import build_model
        from doc2tex_tpu.train.checkpoint import (
            load_pretrained_params,
            save_checkpoint,
        )
        from doc2tex_tpu.train.trainer import create_train_state

        cfg = small_config()
        model = build_model(cfg, conv.num_classes)
        state, _ = create_train_state(model, cfg, jax.random.PRNGKey(0), (2, 32, 64, 1))
        path = str(tmp_path / "pre.msgpack")
        save_checkpoint(path, state, {})
        params2, info = load_pretrained_params(path, state.params)
        assert info["loaded"] > 0 and info["skipped"] == 0


class TestEngine:
    def test_sanity_check_train(self, tmp_path):
        from doc2tex_tpu.engine import train

        cfg = small_config(sanity_check=True)
        metrics = train(cfg, str(tmp_path / "run"))
        assert np.isfinite(metrics["loss"])
        assert (tmp_path / "run" / "last_checkpoint.msgpack").exists()
        assert (tmp_path / "run" / "summary.csv").exists()

    def test_resume(self, tmp_path):
        from doc2tex_tpu.engine import init_training, train

        cfg = small_config(sanity_check=True)
        train(cfg, str(tmp_path / "run"))
        cfg2 = small_config(
            sanity_check=True,
            resume_path=str(tmp_path / "run" / "last_checkpoint.msgpack"),
        )
        b = init_training(cfg2)
        assert b.start_iter >= 1


class TestConfigs:
    def test_shipped_yaml_configs_parse(self):
        from doc2tex_tpu.config import load_config

        for path in ("config/train.yaml", "config/test.yaml",
                     "config/train_synth.yaml"):
            cfg = load_config(path)
            assert cfg["SequenceModeling"]["name"] == "ViT"
            assert cfg["batch_max_length"] > 0

    def test_export_csv_columns(self, tmp_path):
        import csv as _csv

        from doc2tex_tpu.engine import train

        cfg = small_config(sanity_check=True, export_csv=True)
        train(cfg, str(tmp_path / "run"))
        csvs = list((tmp_path / "run").glob("preds_iter*.csv"))
        assert csvs
        with open(csvs[0]) as f:
            header = next(_csv.reader(f))
        assert header == ["name", "pred", "label", "ed", "iscorrect"]

    def test_resume_fallback_on_corrupt(self, tmp_path):
        """Corrupt checkpoint -> fresh start, not a crash (reference
        model_utils.py:227-235)."""
        from doc2tex_tpu.engine import init_training

        bad = tmp_path / "bad.msgpack"
        bad.write_bytes(b"not a checkpoint")
        cfg = small_config(resume_path=str(bad))
        b = init_training(cfg)
        assert b.start_iter == 0
