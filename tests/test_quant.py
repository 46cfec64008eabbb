"""Int8 dynamic-quantization path (ops/quant.py).

The reference has no quantization (torch fp32 CPU); this is a TPU-native
extension — the v5e MXU has ~2x int8 peak over bf16 and the encoder is
compute-bound, so an inference-only int8 path is the remaining headline
lever.  These tests pin: op-level closeness to the f32 result, exact
no-op behavior when the context is off, and encoder-level closeness with
an unchanged parameter tree.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import doc2tex_tpu.ops.quant as quant
from doc2tex_tpu.ops.quant import (
    active_quant_mode,
    int8_conv_general_dilated,
    int8_dot_general,
    maybe_conv_general,
    maybe_dot_general,
    quantized_inference,
)

from doc2tex_tpu.models import build_model
from tests.test_models import tiny_vit_config


@pytest.fixture
def no_gates(monkeypatch):
    """Disable the v5e shape gates so small test shapes take the int8 path."""
    monkeypatch.setattr(quant, "MIN_CONTRACT", 1)
    monkeypatch.setattr(quant, "MIN_OUT", 1)


class TestQuantOps:
    def test_shape_gate_falls_back_exactly(self):
        # below MIN_CONTRACT/MIN_OUT the op is bit-identical to lax (int8
        # REGRESSES on small shapes — tools/int8_microbench.py: 64->128
        # conv is 0.72x)
        k = jax.random.PRNGKey(9)
        a = jax.random.normal(k, (8, 32), jnp.float32)
        w = jax.random.normal(k, (32, 16), jnp.float32)
        q = int8_dot_general(a, w, (((1,), (0,)), ((), ())))
        np.testing.assert_array_equal(np.asarray(q), np.asarray(a @ w))

    def test_dot_general_close_to_f32(self, no_gates):
        k = jax.random.PRNGKey(0)
        a = jax.random.normal(k, (64, 128), jnp.float32)
        w = jax.random.normal(jax.random.PRNGKey(1), (128, 256), jnp.float32) * 0.05
        ref = a @ w
        q = int8_dot_general(a, w, (((1,), (0,)), ((), ())))
        rel = np.abs(np.asarray(q - ref)).max() / np.abs(np.asarray(ref)).max()
        assert rel < 0.03
        assert q.dtype == a.dtype

    def test_dot_general_batched_fallback(self, no_gates):
        # non-Dense contraction pattern -> per-tensor fallback, still close
        k = jax.random.PRNGKey(2)
        a = jax.random.normal(k, (4, 16, 32), jnp.float32)
        b = jax.random.normal(jax.random.PRNGKey(3), (4, 32, 8), jnp.float32)
        dn = (((2,), (1,)), ((0,), (0,)))
        ref = jax.lax.dot_general(a, b, dn)
        q = int8_dot_general(a, b, dn)
        rel = np.abs(np.asarray(q - ref)).max() / np.abs(np.asarray(ref)).max()
        assert rel < 0.05

    def test_conv_close_to_f32(self, no_gates):
        k = jax.random.PRNGKey(4)
        x = jax.random.normal(k, (2, 16, 16, 32), jnp.float32)
        w = jax.random.normal(jax.random.PRNGKey(5), (3, 3, 32, 64), jnp.float32) * 0.05
        dn = ("NHWC", "HWIO", "NHWC")
        ref = jax.lax.conv_general_dilated(x, w, (1, 1), "SAME", dimension_numbers=dn)
        q = int8_conv_general_dilated(x, w, (1, 1), "SAME", dimension_numbers=dn)
        rel = np.abs(np.asarray(q - ref)).max() / np.abs(np.asarray(ref)).max()
        assert rel < 0.03

    def test_zero_input_no_nan(self, no_gates):
        z = jnp.zeros((8, 16), jnp.float32)
        w = jnp.zeros((16, 4), jnp.float32)
        out = int8_dot_general(z, w, (((1,), (0,)), ((), ())))
        assert np.isfinite(np.asarray(out)).all()

    def test_context_gating(self):
        assert active_quant_mode() is None
        assert maybe_dot_general() is None
        assert maybe_conv_general() is None
        with quantized_inference():
            assert active_quant_mode() == "int8"
            assert maybe_dot_general() is int8_dot_general
            assert maybe_conv_general() is int8_conv_general_dilated
        assert active_quant_mode() is None


class TestQuantEncoder:
    def test_encoder_int8_close_and_params_unchanged(self, no_gates):
        cfg = tiny_vit_config()
        model = build_model(cfg, 20)
        img = jax.random.normal(jax.random.PRNGKey(7), (2, 32, 64, 1), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), img, jnp.zeros((2, 4), jnp.int32))

        enc_ref = model.apply(variables, img, method=model.encode)
        with quantized_inference():
            # same variables, quantized trace — param tree is untouched
            enc_q = model.apply(variables, img, method=model.encode)

        a = np.asarray(enc_ref, np.float32).ravel()
        b = np.asarray(enc_q, np.float32).ravel()
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))
        assert cos > 0.99, cos
        # and it genuinely took the quantized path (not a silent no-op)
        assert not np.allclose(a, b)

        # context off again -> bit-identical to the baseline trace
        enc_off = model.apply(variables, img, method=model.encode)
        np.testing.assert_array_equal(np.asarray(enc_ref), np.asarray(enc_off))


class TestQuantDecoderMemory:
    def test_beam_decode_with_int8_memory(self):
        # decoder_mem part: attention memory stored int8 (DecoderState
        # enc/enc_proj + per-sample scales); beam decode must run through
        # the gather path and produce tokens close to the bf16 result
        from doc2tex_tpu.decode.runner import make_decode_fn
        from doc2tex_tpu.models import build_model
        from tests.test_models import tiny_vit_config

        cfg = tiny_vit_config()
        cfg["beam_size"] = 3
        model = build_model(cfg, 20)
        img = jax.random.normal(jax.random.PRNGKey(3), (2, 32, 64, 1), jnp.float32)
        variables = model.init(
            jax.random.PRNGKey(0), img, jnp.zeros((2, 4), jnp.int32)
        )
        decode = make_decode_fn(model, cfg, beam_size=3, max_steps=10)
        tok_ref, _ = decode(variables, img)

        with quantized_inference(parts=("decoder_mem",)):
            decode_q = make_decode_fn(model, cfg, beam_size=3, max_steps=10)
            tok_q, _ = decode_q(variables, img)
        assert tok_q.shape == tok_ref.shape
        # untrained tiny model decodes degenerately -> identical tokens;
        # the real assertion is the quantized trace runs end-to-end
        assert (np.asarray(tok_q) == np.asarray(tok_ref)).mean() > 0.9

    def test_tfm_beam_decode_with_int8_memory(self):
        # TFM-family decoder_mem (cross-attention K/V memory) +
        # decoder_kv (growing self-attention KV caches) stored int8 with
        # per-vector scales (quantize_kv); chunked decode must grow the
        # scale tensors in lockstep with the caches (grow_decode_state)
        from doc2tex_tpu.decode.runner import make_decode_fn
        from doc2tex_tpu.models import build_model
        from tests.test_models import VOCAB_SIZE, tfm_config

        cfg = tfm_config()
        cfg["beam_size"] = 3
        model = build_model(cfg, VOCAB_SIZE)
        img = jax.random.normal(
            jax.random.PRNGKey(3), (2, 32, 64, 1), jnp.float32
        )
        variables = model.init(
            jax.random.PRNGKey(0), img, jnp.zeros((2, 9), jnp.int32), False
        )
        # max_steps=40 forces the chunked path (grow_decode_state pads
        # caches + scales between the sequential while_loops)
        decode = make_decode_fn(model, cfg, beam_size=3, max_steps=40)
        tok_ref, _ = decode(variables, img)
        with quantized_inference(parts=("decoder_mem", "decoder_kv")):
            decode_q = make_decode_fn(model, cfg, beam_size=3, max_steps=40)
            tok_q, _ = decode_q(variables, img)
        assert tok_q.shape == tok_ref.shape
        assert (np.asarray(tok_q) == np.asarray(tok_ref)).mean() > 0.9
        # mem-only (the shipping int8_full point: decoder_kv is the
        # measured-loss knob, ops/quant.py verdict)
        with quantized_inference(parts=("decoder_mem",)):
            decode_m = make_decode_fn(model, cfg, beam_size=3, max_steps=40)
            tok_m, _ = decode_m(variables, img)
        assert (np.asarray(tok_m) == np.asarray(tok_ref)).mean() > 0.9

    def test_tfm_state_int8_buffers_and_scales(self):
        from doc2tex_tpu.models import build_model
        from tests.test_models import VOCAB_SIZE, tfm_config

        cfg = tfm_config()
        model = build_model(cfg, VOCAB_SIZE)
        img = jnp.zeros((1, 32, 64, 1), jnp.float32)
        variables = model.init(
            jax.random.PRNGKey(0), img, jnp.zeros((1, 9), jnp.int32), False
        )
        enc = model.apply(variables, img, method=model.encode)
        state = model.apply(variables, enc, 8, method=model.init_decode_state)
        assert state.k_scales == () and state.k_mem_scales == ()
        assert state.k_cache[0].dtype != jnp.int8
        # decoder_mem alone: cross-attn memory int8, caches stay bf16
        with quantized_inference(parts=("decoder_mem",)):
            state_m = model.apply(
                variables, enc, 8, method=model.init_decode_state
            )
        assert state_m.k_mem[0].dtype == jnp.int8
        assert state_m.k_cache[0].dtype != jnp.int8
        assert state_m.k_scales == ()
        assert state_m.k_mem_scales[0].shape == state_m.k_mem[0].shape[:3]
        # + decoder_kv: the growing caches go int8 too
        with quantized_inference(parts=("decoder_mem", "decoder_kv")):
            state_q = model.apply(
                variables, enc, 8, method=model.init_decode_state
            )
        assert state_q.k_cache[0].dtype == jnp.int8
        assert state_q.k_mem[0].dtype == jnp.int8
        # per-vector scales: (B, M, nh) matching the cache's slot axis
        assert state_q.k_scales[0].shape == state_q.k_cache[0].shape[:3]
        assert state_q.k_mem_scales[0].shape == state_q.k_mem[0].shape[:3]

    def test_bf16_state_has_placeholder_scales(self):
        from doc2tex_tpu.models import build_model
        from tests.test_models import tiny_vit_config

        cfg = tiny_vit_config()
        model = build_model(cfg, 20)
        img = jnp.zeros((1, 32, 64, 1), jnp.float32)
        variables = model.init(
            jax.random.PRNGKey(0), img, jnp.zeros((1, 4), jnp.int32)
        )
        enc = model.apply(variables, img, method=model.encode)
        state = model.apply(
            variables, enc, 10, method=model.init_decode_state
        )
        assert state.enc_scale.shape == (0,)
        assert state.enc.dtype != jnp.int8
        with quantized_inference(parts=("decoder_mem",)):
            state_q = model.apply(
                variables, enc, 10, method=model.init_decode_state
            )
        assert state_q.enc.dtype == jnp.int8
        assert state_q.enc_proj.dtype == jnp.int8
        assert state_q.enc_scale.shape[0] == enc.shape[0]
