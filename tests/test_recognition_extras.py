"""Recognition flow + demo-fork extra components tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from doc2tex_tpu.config import make_config
from doc2tex_tpu.models.extras import (
    ASPP,
    ClovaResNetFeatureExtractor,
    ConfigurableVGG,
    DepthwiseSeparableConv,
    LearnedResizer,
    LocationAwareAttention2DCell,
    Maxout,
    SARDecoderCell,
)


def tiny_recog_config():
    return make_config(
        dict(
            max_dimension=[64, 128],
            min_dimension=[32, 32],
            batch_max_length=12,
            downsample=1,
            synthetic_data=1,
            FeatureExtraction={"name": "None"},
            SequenceModeling={
                "name": "ViT",
                "params": {
                    "backbone": {
                        "name": "resnet", "input_channel": 1,
                        "output_channel": 64, "gcb": False,
                    },
                    "fix_embed": True, "input_channel": 1,
                    "patching_style": "2d", "patch_size": [2, 2],
                    "depth": 2, "num_heads": 4, "hidden_size": 64,
                },
            },
            Prediction={
                "name": "Attnv2",
                "params": {
                    "seqmodel": "TFM", "input_size": 64, "hidden_size": 64,
                    "kernel_size": 2, "kernel_dim": 32, "embed_target": True,
                    "enc_init": True, "attn_type": "coverage", "droprate": 0.0,
                },
            },
            dtype="float32",
            vocab="",
        )
    )


class TestRecognitionFlow:
    def test_single_and_batch(self):
        from doc2tex_tpu.recognition import MathRecognition

        rec = MathRecognition(config=tiny_recog_config())
        crop = np.full((40, 90), 255, np.uint8)
        crop[10:30, 10:80] = 0
        out = rec(crop)
        assert isinstance(out, str)
        outs = rec([crop, crop[:20, :40]])
        assert isinstance(outs, list) and len(outs) == 2

    def test_quantized_flow_runs_and_matches(self, monkeypatch):
        # `quantize: int8` config opt-in (ops/quant.py); gates disabled so
        # the tiny model actually takes the int8 path
        import doc2tex_tpu.ops.quant as quant
        from doc2tex_tpu.recognition import MathRecognition

        monkeypatch.setattr(quant, "MIN_CONTRACT", 1)
        monkeypatch.setattr(quant, "MIN_OUT", 1)
        cfg = tiny_recog_config()
        crop = np.full((40, 90), 255, np.uint8)
        crop[10:30, 10:80] = 0
        base = MathRecognition(config=cfg)(crop)
        qcfg = tiny_recog_config()
        qcfg["quantize"] = "int8"
        rec_q = MathRecognition(config=qcfg)
        assert rec_q.quant_parts == ("encoder",)
        out = rec_q(crop)
        assert isinstance(out, str)
        # random tiny model: both decode degenerately -> strings equal
        assert out == base
        # int8_full also stores the decode attention memory int8
        fcfg = tiny_recog_config()
        fcfg["quantize"] = "int8_full"
        rec_f = MathRecognition(config=fcfg)
        assert rec_f.quant_parts == ("encoder", "decoder_mem")
        assert rec_f(crop) == base

    def test_postprocess(self):
        from doc2tex_tpu.recognition.flow import postprocess_prediction

        assert postprocess_prediction("x ^ { 2 } + 1") == "x^{2}+1"
        out = postprocess_prediction(r"\hspace { 1 c m } x")
        assert "hspace" in out and " " not in out.split("hspace")[1][:6]

    def test_snap_batch_ladder(self):
        # bounded program set: coarse {1, 8, cap} ladder below the cap
        # (decode time is flat in batch size, so padding rows are ~free
        # and fewer shapes means fewer traces), multiples of cap above
        from doc2tex_tpu.recognition.flow import _snap_batch

        assert [_snap_batch(n) for n in (1, 2, 3, 5, 9, 33, 64, 65, 129)] == [
            1, 8, 8, 8, 64, 64, 64, 128, 192]
        for n in range(1, 200):
            assert _snap_batch(n) >= n

    def test_ragged_group_snap_trim(self):
        # 5 crops -> padded to 8 on device, outputs trimmed back to 5
        from doc2tex_tpu.recognition import MathRecognition

        rec = MathRecognition(config=tiny_recog_config())
        crops = [np.full((40 + 5 * i, 80 + 9 * i), 255, np.uint8)
                 for i in range(5)]
        for c in crops:
            c[5:-5, 5:-5] = 0
        out = rec(crops)
        assert len(out) == 5 and all(isinstance(s, str) for s in out)


class TestExtras:
    def test_maxout(self):
        x = jnp.arange(12.0).reshape(2, 6)
        out = Maxout(pool_size=2)(x)
        assert out.shape == (2, 3)
        np.testing.assert_allclose(np.asarray(out[0]), [1, 3, 5])

    def test_depthwise(self):
        m = DepthwiseSeparableConv(features=8)
        x = jnp.zeros((1, 16, 16, 4))
        v = m.init(jax.random.PRNGKey(0), x)
        assert m.apply(v, x).shape == (1, 16, 16, 8)

    def test_aspp(self):
        m = ASPP(features=16)
        x = jnp.zeros((1, 8, 8, 32))
        v = m.init(jax.random.PRNGKey(0), x)
        assert m.apply(v, x).shape == (1, 8, 8, 16)

    def test_loc_aware_2d(self):
        m = LocationAwareAttention2DCell(hidden_dim=32)
        enc = jnp.zeros((2, 4, 8, 16))
        hidden = jnp.zeros((2, 32))
        align = jnp.zeros((2, 4, 8))
        v = m.init(jax.random.PRNGKey(0), hidden, enc, align)
        ctx, a = m.apply(v, hidden, enc, align)
        assert ctx.shape == (2, 16) and a.shape == (2, 4, 8)
        np.testing.assert_allclose(np.asarray(a.sum(axis=(1, 2))), 1.0, rtol=1e-5)

    def test_sar_cell(self):
        m = SARDecoderCell(input_size=32, attention_size=16)
        feat = jnp.zeros((2, 4, 8, 32))
        inp = jnp.zeros((2, 32))
        carry = (
            (jnp.zeros((2, 32)), jnp.zeros((2, 32))),
            (jnp.zeros((2, 32)), jnp.zeros((2, 32))),
        )
        v = m.init(jax.random.PRNGKey(0), inp, feat, carry)
        ctx, a, carry2 = m.apply(v, inp, feat, carry)
        assert ctx.shape == (2, 32) and a.shape == (2, 4, 8)

    def test_clova_resnet(self):
        m = ClovaResNetFeatureExtractor(output_channel=64)
        x = jnp.zeros((1, 32, 64, 1))
        v = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(v, x)
        assert out.shape[0] == 1 and out.shape[-1] == 64
        assert out.shape[1] >= 1 and out.shape[2] > out.shape[1]

    def test_configurable_vgg(self):
        m = ConfigurableVGG(stages=((16,), (32,)), down_sample=((2, 2), (2, 1)))
        x = jnp.zeros((1, 32, 64, 1))
        v = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(v, x)
        assert out.shape == (1, 8, 32, 32)

    def test_learned_resizer(self):
        m = LearnedResizer(num_buckets=21, width=16)
        x = jnp.zeros((2, 64, 64, 1))
        v = m.init(jax.random.PRNGKey(0), x)
        assert m.apply(v, x).shape == (2, 21)


class TestDemoApp:
    def test_no_detect_path(self):
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "demo"))
        from app import App

        app = App(recog_config=tiny_recog_config(), use_detect=False)
        page = np.full((48, 96), 255, np.uint8)
        page[10:40, 10:80] = 0
        out = app(page)
        assert len(out) == 1 and isinstance(out[0][1], str)
