"""Pallas op tests (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from doc2tex_tpu.ops import attention_step_reference, fused_attention_step


class TestFusedAttentionStep:
    def _inputs(self, B=10, S=83, D=64, H=64, K=32, seed=0):
        rng = np.random.default_rng(seed)
        return dict(
            enc=jnp.asarray(rng.normal(size=(B, S, D)).astype(np.float32)),
            enc_proj=jnp.asarray(rng.normal(size=(B, S, H)).astype(np.float32)),
            q=jnp.asarray(rng.normal(size=(B, H)).astype(np.float32)),
            loc_feat=jnp.asarray(rng.normal(size=(B, S, K)).astype(np.float32)),
            w_loc=jnp.asarray(rng.normal(size=(K, H)).astype(np.float32)) * 0.1,
            b_loc=jnp.asarray(rng.normal(size=(H,)).astype(np.float32)) * 0.1,
            w_score=jnp.asarray(rng.normal(size=(H,)).astype(np.float32)) * 0.1,
        )

    def test_matches_reference(self):
        kw = self._inputs()
        c1, a1 = attention_step_reference(**{**kw, "w_score": kw["w_score"].reshape(-1, 1)}, valid_len=80)
        c2, a2 = fused_attention_step(**kw, valid_len=80, block_b=8, interpret=True)
        np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=1e-5)
        np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=1e-6)

    def test_padding_masked(self):
        kw = self._inputs()
        _, alpha = fused_attention_step(**kw, valid_len=40, block_b=8, interpret=True)
        a = np.asarray(alpha)
        assert a[:, 40:].max() < 1e-12
        np.testing.assert_allclose(a.sum(-1), 1.0, rtol=1e-5)

    def test_ragged_batch_blocks(self):
        kw = self._inputs(B=10)
        c, a = fused_attention_step(**kw, block_b=4, interpret=True)  # 10 % 4 != 0
        assert c.shape == (10, 64) and a.shape == (10, 83)
