"""Model-assembly variants: every stage combination the reference supports.

Covers the config matrix of reference ``build_feat.py``/``build_seq.py``/
``build_pred.py``: ResNet/VGG feature extractors, BiLSTM/None sequence
modeling, Attn (luong/bahdanau/coverage/loc_aware) and TFM heads.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from doc2tex_tpu.config import make_config
from doc2tex_tpu.models import build_model

V = 20


def cnn_config(feat="ResNet", seq="None", pred="TFM", attn_type="coverage",
               method="dot", **kw):
    pred_params = (
        {
            "d_model": 64, "nhead": 4, "num_decoder_layers": 2,
            "dim_feedforward": 128, "dropout": 0.0,
        }
        if pred == "TFM"
        else {
            "seqmodel": "BiLSTM" if seq == "BiLSTM" else "None",
            "input_size": 64, "hidden_size": 64, "kernel_size": 2,
            "kernel_dim": 32, "embed_target": True, "enc_init": False,
            "attn_type": attn_type, "method": method, "droprate": 0.0,
        }
    )
    c = make_config(
        dict(
            max_dimension=[64, 128], min_dimension=[32, 32], batch_max_length=8,
            FeatureExtraction={
                "name": feat,
                "params": {"input_channel": 1, "output_channel": 64},
            },
            SequenceModeling={
                "name": seq,
                "params": {"hidden_size": 64, "output_size": 64,
                           "num_layers": 2, **kw.pop("seq_params", {})},
            },
            Prediction={"name": pred, "params": pred_params},
            dtype="float32",
        )
    )
    c.update(kw)
    return c


def run_forward(cfg, img_hw=(32, 64)):
    model = build_model(cfg, V)
    img = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, *img_hw, 1)).astype(np.float32)
    )
    text = jnp.ones((2, 9), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), img, text, False)
    logits = model.apply(variables, img, text, False)
    assert logits.shape == (2, 9, V)
    assert np.isfinite(np.asarray(logits)).all()
    return model, variables


class TestStageMatrix:
    def test_resnet_none_tfm_2d_posenc(self):
        run_forward(cnn_config("ResNet", "None", "TFM"))

    def test_vgg_bilstm_attn_coverage(self):
        run_forward(cnn_config("VGG", "BiLSTM", "Attn"))

    def test_resnet_bilstm_attn_bahdanau(self):
        run_forward(cnn_config("ResNet", "BiLSTM", "Attn", attn_type="bahdanau"))

    def test_bilstm_with_pos_enc_gatedsum(self):
        cfg = cnn_config("ResNet", "BiLSTM", "Attn",
                         seq_params={"pos_enc": True})
        run_forward(cfg)

    @pytest.mark.parametrize("method", ["dot", "general", "concat"])
    def test_luong_methods(self, method):
        run_forward(cnn_config("ResNet", "BiLSTM", "Attn",
                               attn_type="luong", method=method))

    def test_luong_decode_steps(self):
        cfg = cnn_config("ResNet", "BiLSTM", "Attn", attn_type="luong")
        model, variables = run_forward(cfg)
        img = jnp.zeros((2, 32, 64, 1), jnp.float32)
        enc = model.apply(variables, img, method="encode")
        state = model.apply(variables, enc, 8, method="init_decode_state")
        state, logits = model.apply(
            variables, state, jnp.zeros((2,), jnp.int32), method="decode_step"
        )
        assert logits.shape == (2, V)


class TestPosEncodings:
    def test_posenc_2d_hw_shape(self):
        from doc2tex_tpu.models.layers import posenc_2d_hw

        pe = posenc_2d_hw(4, 6, 32)
        assert pe.shape == (4, 6, 32)
        # h half varies along h only; w half along w only
        assert np.allclose(pe[0, 0, :16], pe[0, 3, :16])
        assert np.allclose(pe[0, 0, 16:], pe[2, 0, 16:])

    def test_adaptive_2d(self):
        from doc2tex_tpu.models.layers import Adaptive2DPositionalEncoding

        m = Adaptive2DPositionalEncoding(d_model=32)
        x = jnp.zeros((2, 4, 6, 32))
        v = m.init(jax.random.PRNGKey(0), x)
        assert m.apply(v, x).shape == (2, 4, 6, 32)

    def test_posconv(self):
        from doc2tex_tpu.models.layers import PosConv

        m = PosConv(dim=16)
        x = jnp.ones((2, 24, 16))
        v = m.init(jax.random.PRNGKey(0), x, (4, 6))
        assert m.apply(v, x, (4, 6)).shape == (2, 24, 16)


class TestTrig1D:
    def test_trig_1d_encoder(self):
        cfg = cnn_config("ResNet", "None", "TFM")
        cfg["FeatureExtraction"] = {"name": "None"}
        cfg["SequenceModeling"] = {
            "name": "ViT",
            "params": {
                "backbone": {"name": "resnet", "input_channel": 1,
                             "output_channel": 64, "gcb": False},
                "fix_embed": False, "input_channel": 1,
                "patching_style": "1d", "patch_size": [1, 2],
                "depth": 2, "num_heads": 4, "hidden_size": 64,
            },
        }
        cfg["Prediction"] = {
            "name": "TFM",
            "params": {"d_model": 64, "nhead": 4, "num_decoder_layers": 2,
                       "dim_feedforward": 128, "dropout": 0.0},
        }
        model, variables = run_forward(cfg)
        img = jnp.zeros((2, 32, 64, 1), jnp.float32)
        enc = model.apply(variables, img, method="encode")
        from doc2tex_tpu.models.vit import grid_size_for

        gh, gw = grid_size_for((32, 64), (1, 2), "resnet", "1d")
        assert gh == 1 and enc.shape == (2, gw + 1, 64)


class TestFocalLoss:
    def test_finite(self):
        from doc2tex_tpu.detection import make_priors
        from doc2tex_tpu.detection.loss import focal_loss

        priors = jnp.asarray(make_priors()[:256])
        rng = np.random.default_rng(0)
        loc = jnp.asarray(rng.normal(size=(2, 256, 4)).astype(np.float32)) * 0.1
        conf = jnp.asarray(rng.normal(size=(2, 256, 2)).astype(np.float32))
        gt = jnp.asarray([[[0.1, 0.1, 0.4, 0.2]], [[0.5, 0.5, 0.9, 0.6]]])
        valid = jnp.ones((2, 1), bool)
        ll, lc = focal_loss(loc, conf, gt, valid, priors)
        assert np.isfinite(float(ll)) and float(lc) > 0


class TestLearnedResize:
    def test_loop_converges(self):
        from doc2tex_tpu.transforms.preprocess import learned_resize

        img = np.full((40, 300), 255, np.uint8)
        # always predict bucket 4 -> width 160
        out = learned_resize(img, lambda im: 4)
        assert out.shape[1] == 160
        # aspect preserved-ish
        assert abs(out.shape[0] - round(40 * 160 / 300)) <= 1


class TestTFMBeamPath:
    def test_beam1_matches_greedy_tfm(self):
        """TFM-head beam decode (tfm_gather over (L,B,T,...) caches) is
        self-consistent: beam_size=1 must reproduce greedy tokens."""
        from tests.test_models import tfm_config, VOCAB_SIZE
        from doc2tex_tpu.decode.runner import make_decode_fn
        from doc2tex_tpu.models import build_model

        cfg = tfm_config()
        model = build_model(cfg, VOCAB_SIZE)
        img = np.random.default_rng(5).integers(
            0, 255, (3, 32, 64, 1), dtype=np.uint8
        )
        variables = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((3, 32, 64, 1), jnp.float32),
            jnp.zeros((3, 9), jnp.int32),
            False,
        )
        greedy = make_decode_fn(model, cfg, beam_size=1, max_steps=9)
        tg, _ = greedy(variables, jnp.asarray(img))
        beam = make_decode_fn(model, cfg, beam_size=3, max_steps=9)
        tb, scores = beam(variables, jnp.asarray(img))
        assert tb.shape == tg.shape
        assert np.isfinite(np.asarray(scores)).all()
        # with K=1 the beam path must equal greedy exactly
        beam1 = make_decode_fn(model, cfg, beam_size=1, max_steps=9)
        t1, _ = beam1(variables, jnp.asarray(img))
        np.testing.assert_array_equal(np.asarray(t1), np.asarray(tg))

    def test_chunked_decode_token_exact(self):
        """Chunked KV-cache decode (grow_decode_state between sequential
        while_loops) is token-exact vs single-loop full-capacity decode,
        for both greedy and beam — the pad is pure capacity, the live
        prefix and ancestry mask are unchanged."""
        from tests.test_models import tfm_config, VOCAB_SIZE
        from doc2tex_tpu.decode.runner import make_decode_fn
        from doc2tex_tpu.models import build_model

        cfg = tfm_config()
        model = build_model(cfg, VOCAB_SIZE)
        img = np.random.default_rng(11).integers(
            0, 255, (2, 32, 64, 1), dtype=np.uint8
        )
        variables = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((2, 32, 64, 1), jnp.float32),
            jnp.zeros((2, 9), jnp.int32),
            False,
        )
        img = jnp.asarray(img)
        # max_steps=24 with 3 chunks -> ends [8, 16, 24]
        for beam in (1, 3):
            full = make_decode_fn(
                model, cfg, beam_size=beam, max_steps=24, decode_chunks=1
            )
            chunked = make_decode_fn(
                model, cfg, beam_size=beam, max_steps=24, decode_chunks=3
            )
            tf_, af = full(variables, img)
            tc, ac = chunked(variables, img)
            np.testing.assert_array_equal(np.asarray(tf_), np.asarray(tc))
            np.testing.assert_allclose(
                np.asarray(af), np.asarray(ac), rtol=1e-6, atol=1e-6
            )


class TestAttnV1WithViT:
    def test_v1_attends_over_cls(self):
        """Prediction 'Attn' (v1): attention memory includes the cls token
        and the hidden init comes from it (reference seq2seq.py enc_init)."""
        from tests.test_models import tiny_vit_config, VOCAB_SIZE
        from doc2tex_tpu.models import build_model

        cfg = tiny_vit_config()
        cfg["Prediction"] = dict(cfg["Prediction"], name="Attn")
        cfg["Prediction"]["params"] = dict(
            cfg["Prediction"]["params"], enc_init=True
        )
        model = build_model(cfg, VOCAB_SIZE)
        img = jnp.zeros((2, 32, 64, 1), jnp.float32)
        text = jnp.zeros((2, 13), jnp.int32)
        variables = model.init(jax.random.PRNGKey(0), img, text, False)
        logits = model.apply(variables, img, text, False)
        assert logits.shape == (2, 13, VOCAB_SIZE)
        # v1 attends over ALL tokens incl. cls: alpha length == N+1
        enc = model.apply(variables, img, method="encode")
        state = model.apply(variables, enc, 13, method="init_decode_state")
        assert state.enc.shape[1] == enc.shape[1]  # no cls split (v2 drops it)
