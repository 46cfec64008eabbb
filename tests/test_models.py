import jax
import jax.numpy as jnp
import numpy as np
import pytest

from doc2tex_tpu.config import make_config
from doc2tex_tpu.models import build_model
from doc2tex_tpu.models.resnet import feature_hw
from doc2tex_tpu.models.vit import grid_size_for


VOCAB_SIZE = 20  # synthetic num_classes incl. specials


def tiny_vit_config(**kw):
    c = make_config(
        dict(
            max_dimension=[64, 128],
            min_dimension=[32, 32],
            batch_max_length=12,
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
                    "teacher_forcing": 1.0,
                    "droprate": 0.0,
                },
            },
            dtype="float32",
        )
    )
    c.update(kw)
    return c


def tfm_config():
    c = tiny_vit_config()
    c["Prediction"] = {
        "name": "TFM",
        "params": {
            "d_model": 64,
            "nhead": 4,
            "num_decoder_layers": 2,
            "dim_feedforward": 128,
            "dropout": 0.0,
        },
    }
    return c


@pytest.fixture(scope="module")
def image():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.normal(size=(2, 32, 64, 1)).astype(np.float32))


class TestShapes:
    def test_resnet_feature_hw_matches_reference_arithmetic(self):
        # reference FAN ResNet: H//16 - 1, W//4 + 1 (resnet.py:94-156)
        assert feature_hw(64, 128) == (3, 33)
        assert feature_hw(32, 64) == (1, 17)

    def test_grid_size(self):
        # feature (3, 33) -> patch 2x2 -> grid (2, 17)
        assert grid_size_for((64, 128), (2, 2), "resnet") == (2, 17)


class TestAttnModel:
    def test_forward_shapes(self, image):
        cfg = tiny_vit_config()
        model = build_model(cfg, VOCAB_SIZE)
        text = jnp.zeros((2, 13), jnp.int32)  # batch_max_length + 1
        variables = model.init(jax.random.PRNGKey(0), image, text, False)
        logits = model.apply(variables, image, text, False)
        assert logits.shape == (2, 13, VOCAB_SIZE)
        assert jnp.isfinite(logits).all()

    def test_encode_shape(self, image):
        cfg = tiny_vit_config()
        model = build_model(cfg, VOCAB_SIZE)
        text = jnp.zeros((2, 13), jnp.int32)
        variables = model.init(jax.random.PRNGKey(0), image, text, False)
        enc = model.apply(variables, image, method="encode")
        gh, gw = grid_size_for((32, 64), (2, 2), "resnet")
        assert enc.shape == (2, gh * gw + 1, 64)

    def test_teacher_forcing_matches_stepwise(self, image):
        """scan-based teacher-forced logits == manual step loop."""
        cfg = tiny_vit_config()
        model = build_model(cfg, VOCAB_SIZE)
        text = jnp.asarray(
            np.random.default_rng(1).integers(0, VOCAB_SIZE, size=(2, 13)),
            jnp.int32,
        )
        variables = model.init(jax.random.PRNGKey(0), image, text, False)
        full = model.apply(variables, image, text, False)

        enc = model.apply(variables, image, method="encode")
        state = model.apply(variables, enc, 13, method="init_decode_state")
        outs = []
        for i in range(13):
            state, logits = model.apply(
                variables, state, text[:, i], method="decode_step"
            )
            outs.append(logits)
        step = jnp.stack(outs, axis=1)
        np.testing.assert_allclose(np.asarray(full), np.asarray(step), rtol=2e-4, atol=2e-4)


class TestTFMModel:
    def test_kv_cache_matches_full_pass(self, image):
        """step-by-step KV-cache decode logits == full causal pass logits."""
        cfg = tfm_config()
        model = build_model(cfg, VOCAB_SIZE)
        T = 9
        text = jnp.asarray(
            np.random.default_rng(2).integers(1, VOCAB_SIZE, size=(2, T)), jnp.int32
        )
        variables = model.init(jax.random.PRNGKey(0), image, text, False)
        full = model.apply(variables, image, text, False)  # (2, T, V)

        enc = model.apply(variables, image, method="encode")
        state = model.apply(variables, enc, T, method="init_decode_state")
        outs = []
        for i in range(T):
            state, logits = model.apply(
                variables, state, text[:, i], method="decode_step"
            )
            outs.append(logits)
        step = jnp.stack(outs, axis=1)
        np.testing.assert_allclose(
            np.asarray(full), np.asarray(step), rtol=2e-3, atol=2e-3
        )

    def test_train_mode_runs_with_dropout(self, image):
        cfg = tfm_config()
        cfg["Prediction"]["params"]["dropout"] = 0.2
        model = build_model(cfg, VOCAB_SIZE)
        text = jnp.ones((2, 9), jnp.int32)
        variables = model.init(jax.random.PRNGKey(0), image, text, False)
        logits, _ = model.apply(
            variables,
            image,
            text,
            True,
            rngs={"dropout": jax.random.PRNGKey(1)},
            mutable=["batch_stats"],
        )
        assert logits.shape == (2, 9, VOCAB_SIZE)
