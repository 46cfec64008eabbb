"""Bidirectional LSTM sequence modeling (CRNN-style variants).

Parity target: reference ``BidirectionalLSTM`` / ``BiLSTM_Seq_Modeling``
(``doc2tex/modules/component/seq_modeling/bilstm.py:6-39``): n stacked
(biLSTM -> Linear) layers over the width axis of a height-collapsed CNN
feature map.

TPU-native: the time recurrence is a ``lax.scan`` (one fused program over
the sequence), f32 carries, bf16 matmuls.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import trunc_init

Dtype = Any


def _lstm_scan(params, xs, reverse: bool = False):
    """xs: (T, B, I) -> hs: (T, B, H). torch LSTM gate order i,f,g,o."""
    T, B, _ = xs.shape
    H = params["w_hh"].shape[0]

    def cell(carry, x):
        h, c = carry
        gates = (
            x @ params["w_ih"] + params["b_ih"] + h @ params["w_hh"] + params["b_hh"]
        ).astype(jnp.float32)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    init = (jnp.zeros((B, H), jnp.float32), jnp.zeros((B, H), jnp.float32))
    _, hs = jax.lax.scan(cell, init, xs, reverse=reverse)
    return hs


class BidirectionalLSTM(nn.Module):
    hidden_size: int
    output_size: int

    @nn.compact
    def __call__(self, x):
        """x: (B, T, I) -> (B, T, output_size)."""
        B, T, I = x.shape
        H = self.hidden_size
        f32 = jnp.float32

        def mk(prefix):
            return {
                "w_ih": self.param(f"{prefix}_w_ih", trunc_init, (I, 4 * H), f32),
                "b_ih": self.param(f"{prefix}_b_ih", nn.initializers.zeros, (4 * H,), f32),
                "w_hh": self.param(f"{prefix}_w_hh", trunc_init, (H, 4 * H), f32),
                "b_hh": self.param(f"{prefix}_b_hh", nn.initializers.zeros, (4 * H,), f32),
            }

        xs = jnp.transpose(x, (1, 0, 2)).astype(f32)
        fwd = _lstm_scan(mk("fwd"), xs)
        bwd = _lstm_scan(mk("bwd"), xs, reverse=True)
        hs = jnp.concatenate([fwd, bwd], axis=-1)  # (T, B, 2H)
        out = nn.Dense(self.output_size)(jnp.transpose(hs, (1, 0, 2)))
        return out


class BiLSTMSeqModeling(nn.Module):
    """n stacked BidirectionalLSTM layers (reference bilstm.py:27-39) with
    the optional 1D-pos-enc + GatedSum blend of the reference wiring
    (``build_seq.py:14-19,46-57``)."""

    hidden_size: int = 256
    output_size: int = 256
    num_layers: int = 2
    use_pos_enc: bool = False

    @nn.compact
    def __call__(self, x):
        inp = x
        for _ in range(self.num_layers):
            x = BidirectionalLSTM(self.hidden_size, self.output_size)(x)
        if self.use_pos_enc:
            from .layers import GatedSum, posenc_1d

            B, T, _ = inp.shape
            pe = jnp.asarray(posenc_1d(T, inp.shape[-1]))
            pos_feat = (inp + pe[None].astype(inp.dtype))
            if pos_feat.shape[-1] != x.shape[-1]:
                pos_feat = nn.Dense(x.shape[-1])(pos_feat)
            x = GatedSum()(pos_feat, x)
        return x
