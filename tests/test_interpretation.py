"""Attention visualization tests."""

import jax
import jax.numpy as jnp
import numpy as np

from doc2tex_tpu.models import build_model
from doc2tex_tpu.models.vit import grid_size_for
from doc2tex_tpu.tools.interpretation import (
    attention_rollout,
    collect_vit_attention,
    decoder_attention_maps,
    saliency_overlay,
    upsample_map,
)
from tests.test_models import VOCAB_SIZE, tiny_vit_config


def _model_and_vars():
    cfg = tiny_vit_config()
    model = build_model(cfg, VOCAB_SIZE)
    img = jnp.zeros((1, 32, 64, 1), jnp.float32)
    text = jnp.zeros((1, 13), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), img, text, False)
    return model, variables, img


class TestRollout:
    def test_collect_and_rollout(self):
        model, variables, img = _model_and_vars()
        attns = collect_vit_attention(model, variables, img)
        assert len(attns) == 2  # depth 2
        B, H, N, _ = attns[0].shape
        mask = attention_rollout(attns, discard_ratio=0.5)
        assert mask.shape == (1, N - 1)
        assert mask.max() <= 1.0 + 1e-6 and np.isfinite(mask).all()


class TestDecoderMaps:
    def test_alpha_maps(self):
        model, variables, img = _model_and_vars()
        grid = grid_size_for((32, 64), (2, 2), "resnet")
        tokens = np.zeros(3, np.int32)
        maps = decoder_attention_maps(model, variables, img, tokens, grid)
        assert len(maps) == 3
        assert maps[0].shape == grid
        np.testing.assert_allclose(maps[0].sum(), 1.0, rtol=1e-4)


class TestOverlay:
    def test_upsample_and_overlay(self):
        m = np.random.default_rng(0).random((4, 8)).astype(np.float32)
        up = upsample_map(m, (32, 64))
        assert up.shape == (32, 64)
        img = np.full((32, 64), 255, np.uint8)
        out = saliency_overlay(img, m)
        assert out.shape == (32, 64, 3) and out.dtype == np.uint8


class TestFeatureMaps:
    def test_collect_feature_maps(self):
        from doc2tex_tpu.tools.interpretation import collect_feature_maps

        model, variables, img = _model_and_vars()
        maps = collect_feature_maps(model, variables, img)
        assert maps, "no feature maps captured"
        assert any(m.ndim == 4 for m in maps.values())  # (B, H, W, C) conv maps
