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

    def test_pretrained_load_restores_batch_stats(self, tmp_path, conv):
        # BN running stats must ride along with the weights (reference
        # load_state_dict semantics) — params-only restore would evaluate
        # trained weights against fresh statistics
        from doc2tex_tpu.models import build_model
        from doc2tex_tpu.train.checkpoint import (
            load_pretrained_variables,
            save_checkpoint,
        )
        from doc2tex_tpu.train.trainer import create_train_state, init_model

        cfg = small_config()
        model = build_model(cfg, conv.num_classes)
        state, _ = create_train_state(model, cfg, jax.random.PRNGKey(0), (2, 32, 64, 1))
        # perturb the running stats so restore is distinguishable from init
        bumped = jax.tree_util.tree_map(lambda x: x + 1.25, state.batch_stats)
        state = state._replace(batch_stats=bumped)
        path = str(tmp_path / "pre.msgpack")
        save_checkpoint(path, state, {})

        params0, stats0 = init_model(
            model, jax.random.PRNGKey(3), (1, 32, 64, 1),
            cfg["batch_max_length"] + 1,
        )
        p, s, info = load_pretrained_variables(path, params0, stats0)
        assert info["loaded"] > 0 and info.get("stats_loaded", 0) > 0
        for x, y in zip(
            jax.tree_util.tree_leaves(s),
            jax.tree_util.tree_leaves(bumped),
        ):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y))


class TestEngine:
    def test_sanity_check_train(self, tmp_path):
        from doc2tex_tpu.engine import train

        cfg = small_config(sanity_check=True)
        metrics = train(cfg, str(tmp_path / "run"))
        assert np.isfinite(metrics["loss"])
        assert (tmp_path / "run" / "last_checkpoint.msgpack").exists()
        assert (tmp_path / "run" / "summary.csv").exists()

    def test_sanity_check_train_tfm_family(self, tmp_path):
        """The second decoder family (reference TransformerPrediction,
        tfm.py:35-195) trains through the SAME engine path: create_converter
        picks TFMLabelConverter (PAD=0/GO=1/[s]=2), the shifted-target loss
        masks PAD, and validation decodes with the KV-cache beam."""
        from doc2tex_tpu.engine import train

        cfg = small_config(
            sanity_check=True,
            Prediction={"name": "TFM", "params": {
                "d_model": 64, "nhead": 4, "num_decoder_layers": 2,
                "dim_feedforward": 128, "dropout": 0.1}},
        )
        metrics = train(cfg, str(tmp_path / "run_tfm"))
        assert np.isfinite(metrics["loss"])
        assert (tmp_path / "run_tfm" / "last_checkpoint.msgpack").exists()

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

    def test_release_recipe_config(self):
        """config/train_hard_tfm_big.yaml is the reproducible recipe for
        the shipped synthetic_tfm_big weights: it must build the exact
        released architecture (recog_cfg.yaml synthetic_tfm_big block)
        and a hard-style loader over the KaTeX-inventory vocab."""
        from doc2tex_tpu.config import load_config
        from doc2tex_tpu.data.loader import build_loader
        from doc2tex_tpu.tokenizer.converters import (
            TFMLabelConverter,
            create_converter,
        )

        cfg = load_config("config/train_hard_tfm_big.yaml")
        assert cfg["Prediction"]["params"]["num_decoder_layers"] == 6
        assert cfg["SequenceModeling"]["params"]["hidden_size"] == 256
        conv = create_converter(cfg)
        assert isinstance(conv, TFMLabelConverter)
        assert conv.num_classes == 683  # 679 vocab + unk + PAD/GO/[s]

        cfg["synthetic_data"] = 12  # tiny hermetic split for the test
        cfg["synthetic_kwargs"]["max_len"] = 12
        cfg["batch_size"] = 4
        cfg["keep_smaller_batches"] = True
        tr, ev = build_loader(cfg, conv)
        batch = next(iter(tr))
        assert batch.text.shape[0] == batch.images.shape[0]
        assert (np.asarray(batch.text)[:, 0] == 1).all()  # TFM GO=1 col 0

    def test_synthetic_style_knob(self):
        """build_loader synthetic_style: structured/hard generators and
        a clear error on an unknown style."""
        import pytest

        from doc2tex_tpu.data.loader import build_loader
        from doc2tex_tpu.tokenizer.converters import AttnLabelConverter
        from doc2tex_tpu.data.synthetic import SYNTH_VOCAB

        cfg = small_config()
        cfg["synthetic_data"] = 8
        cfg["synthetic_style"] = "structured"
        cfg["synthetic_kwargs"] = {"max_len": 10}
        conv = AttnLabelConverter(list(SYNTH_VOCAB))
        tr, ev = build_loader(cfg, conv)
        # bucket planning may drop samples outside the small test ladder
        assert 0 < tr.num_samples <= 8
        cfg["synthetic_style"] = "nope"
        with pytest.raises(ValueError, match="synthetic_style"):
            build_loader(cfg, conv)

    def test_empty_loader_raises_not_hangs(self):
        """A loader whose every sample is dropped by bucket planning must
        raise, not busy-hang train's infinite() iterator (found driving
        the release recipe with a too-small max_dimension)."""
        import pytest

        from doc2tex_tpu.data.loader import ArrayDataset, BucketLoader
        from doc2tex_tpu.tokenizer.converters import AttnLabelConverter
        from doc2tex_tpu.data.synthetic import SYNTH_VOCAB

        cfg = small_config()
        cfg["keep_smaller_batches"] = False
        cfg["batch_size"] = 64  # 3 samples -> no full batch ever
        images = [np.zeros((32, 32), np.uint8)] * 3
        conv = AttnLabelConverter(list(SYNTH_VOCAB))
        loader = BucketLoader(
            ArrayDataset(images, ["a b", "b", "a"]), conv, cfg, train=True
        )
        it = loader.infinite()
        with pytest.raises(RuntimeError, match="0 batches"):
            next(it)

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


class TestAdviceFixes:
    """Round-1 advisor findings (ADVICE.md)."""

    def test_keeper_seed_best_from_resume_meta(self, tmp_path, conv):
        # ADVICE #1: resumed runs must not overwrite best_* with worse
        from doc2tex_tpu.models import build_model
        from doc2tex_tpu.train.checkpoint import BestCheckpointKeeper
        from doc2tex_tpu.train.trainer import create_train_state

        cfg = small_config()
        model = build_model(cfg, conv.num_classes)
        state, _ = create_train_state(model, cfg, jax.random.PRNGKey(0), (1, 32, 32, 1))
        keeper = BestCheckpointKeeper(str(tmp_path))
        keeper.seed_best({"best_bleu": 0.7, "best_acc": 0.5})
        saved = keeper.update(state, 10, {"bleu": 0.4, "accuracy": 0.3})
        assert "best_bleu.msgpack" not in saved
        assert "best_accuracy.msgpack" not in saved
        assert "last_checkpoint.msgpack" in saved
        saved = keeper.update(state, 20, {"bleu": 0.8, "accuracy": 0.3})
        assert "best_bleu.msgpack" in saved

    def test_prefetch_producer_propagates_errors(self, conv):
        # ADVICE #2: a raising _assemble must surface, not truncate
        cfg = small_config()
        images, labels = synth_dataset(16, seed=0, max_len=8, max_h=48)
        ds = ArrayDataset(images, labels)
        loader = BucketLoader(ds, conv, cfg, train=True, prefetch=2)

        def boom(*a, **k):
            raise RuntimeError("corrupt sample")

        loader._assemble = boom
        with pytest.raises(RuntimeError, match="corrupt sample"):
            list(loader)

    def test_adamp_respects_decay_mask(self):
        # ADVICE #3: no weight decay on 1-D params when filter_bias_and_bn
        from doc2tex_tpu.train.optim import create_optimizer

        params = {
            "w": jnp.ones((8, 8), jnp.float32),
            "b": jnp.ones((8,), jnp.float32),
        }
        tx = create_optimizer(
            params, opt="adamp", lr=0.1, weight_decay=0.5,
            filter_bias_and_bn=True,
        )
        st = tx.init(params)
        grads = jax.tree_util.tree_map(jnp.zeros_like, params)
        updates, _ = tx.update(grads, st, params)
        assert float(jnp.abs(updates["b"]).max()) == 0.0  # bias: no decay
        assert float(jnp.abs(updates["w"]).max()) > 0.0   # weight: decayed

    def test_validation_accepts_prebuilt_decode_fn(self, conv):
        # ADVICE #4: decode fn built once per run is reused by validation
        from doc2tex_tpu.decode.runner import make_decode_fn
        from doc2tex_tpu.engine.inferencing import validation
        from doc2tex_tpu.models import build_model
        from doc2tex_tpu.train.trainer import create_train_state

        cfg = small_config()
        model = build_model(cfg, conv.num_classes)
        state, _ = create_train_state(model, cfg, jax.random.PRNGKey(0), (1, 32, 32, 1))
        images, labels = synth_dataset(8, seed=1, max_len=8, max_h=48)
        loader = BucketLoader(ArrayDataset(images, labels), conv, cfg, train=False)
        fn = make_decode_fn(model, cfg, beam_size=1)
        out = validation(model, state, conv, loader, cfg, decode_fn=fn, max_batches=1)
        assert "accuracy" in out and out["n_samples"] > 0


class TestClahe:
    def test_clahe_shapes_and_contrast(self):
        from doc2tex_tpu.transforms.preprocess import clahe

        rng = np.random.default_rng(0)
        # low-contrast image: values in [120, 136)
        img = (rng.integers(120, 136, (50, 70))).astype(np.uint8)
        out = clahe(img, clip_limit=2.0, grid=(2, 2))
        assert out.shape == img.shape and out.dtype == np.uint8
        assert out.std() > img.std()  # contrast expanded
        # deterministic
        assert np.array_equal(out, clahe(img, clip_limit=2.0, grid=(2, 2)))

    def test_recognition_preprocess_applies_clahe(self):
        from doc2tex_tpu.recognition.flow import MathRecognition

        cfg = small_config()
        rec = MathRecognition(config=cfg, use_clahe=True)
        rec_off = MathRecognition(config=cfg, use_clahe=False)
        rng = np.random.default_rng(1)
        img = rng.integers(100, 156, (40, 60)).astype(np.uint8)
        a = rec._preprocess(img)
        b = rec_off._preprocess(img)
        assert a.shape == b.shape
        assert not np.array_equal(a, b)


class TestDevicePool:
    """Device-resident sample pools (data/device_pool.py): zero host
    inputs per step, pools as jit args."""

    def test_pool_training_converges_like_host_fed(self, conv):
        from doc2tex_tpu.data.device_pool import (
            build_device_pools,
            make_pool_step,
            pool_schedule,
        )
        from doc2tex_tpu.models import build_model
        from doc2tex_tpu.train.trainer import (
            create_train_state,
            criterion_from_config,
            make_train_step,
        )

        cfg = small_config()
        images, labels = synth_dataset(64, seed=0, max_len=8, max_h=48)
        loader = BucketLoader(ArrayDataset(images, labels), conv, cfg, train=True)
        pools = build_device_pools(loader, conv, cfg, min_samples=1)
        assert pools and all(p.images.shape[0] == p.n for p in pools)
        assert all(p.text.dtype == jnp.int32 for p in pools)

        model = build_model(cfg, conv.num_classes)
        state, tx = create_train_state(model, cfg, jax.random.PRNGKey(0), (4, 32, 32, 1))
        step = make_train_step(model, criterion_from_config(cfg), tx, cfg)
        pool_step = make_pool_step(step, cfg["batch_size"])
        key = jax.random.PRNGKey(3)
        losses = []
        sched = pool_schedule(pools, cfg["batch_size"], np.random.default_rng(1))
        for it, bi in enumerate(sched):
            p = pools[int(bi)]
            state, key, loss = pool_step(state, key, p.images, p.text)
            losses.append(float(loss))
            if it >= 29:
                break
        assert np.isfinite(losses).all()
        assert np.mean(losses[-5:]) < np.mean(losses[:5])  # learning
