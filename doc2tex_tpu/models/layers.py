"""Common layers: ViT blocks, positional encodings, small modules.

Parity targets in the reference:
- ViT core (Mlp/Attention/Block):
  ``doc2tex/modules/component/seq_modeling/vit/vision_transformer.py:9-122``
- 2D sin-cos pos embed: ``doc2tex/modules/component/common/mae_posembed.py:20-70``
- WordPosEnc: ``.../prediction_head/addon_module/position_encoding.py:7-28``
- DropPath: ``doc2tex/modules/component/common/droppath.py:6-40``
- GatedSum: ``doc2tex/modules/component/common/gated_sum.py:4-36``

TPU notes: attention/layernorm accumulate in f32; matmuls run in the
configured compute dtype (bf16 by default) so they land on the MXU.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# truncated-normal(std=0.02) — matches reference trunc_normal_ init
# (vit/utils.py:6-61)
trunc_init = nn.initializers.truncated_normal(stddev=0.02)


def sincos_2d_posembed(
    embed_dim: int, grid_h: int, grid_w: int, cls_token: bool = True
) -> jax.Array:
    """Fixed 2D sin-cos positional embedding (reference mae_posembed.py:20-70).

    Returns float32 (grid_h*grid_w [+1], embed_dim); the cls row is zeros.
    Computed in jnp so callers inside traced code get a cheap on-device
    computation instead of an embedded HLO constant (large tables count
    against the tunneled remote-compile request-size limit).
    """
    assert embed_dim % 4 == 0
    gh = jnp.arange(grid_h, dtype=jnp.float32)
    gw = jnp.arange(grid_w, dtype=jnp.float32)
    grid = jnp.stack(jnp.meshgrid(gw, gh), axis=0)  # w first, like reference
    grid = grid.reshape(2, grid_h, grid_w)

    def emb_1d(pos: jax.Array, dim: int) -> jax.Array:
        omega = jnp.arange(dim // 2, dtype=jnp.float32) / (dim / 2.0)
        omega = 1.0 / 10000**omega
        out = pos.reshape(-1)[:, None] * omega[None, :]
        return jnp.concatenate([jnp.sin(out), jnp.cos(out)], axis=1)

    emb_h = emb_1d(grid[0], embed_dim // 2)
    emb_w = emb_1d(grid[1], embed_dim // 2)
    emb = jnp.concatenate([emb_h, emb_w], axis=1)
    if cls_token:
        emb = jnp.concatenate(
            [jnp.zeros((1, embed_dim), jnp.float32), emb], axis=0
        )
    return emb


def word_posenc(max_len: int, d_model: int) -> jax.Array:
    """Decoder-side 1D sin-cos PE (reference position_encoding.py:7-28).

    jnp-computed for the same remote-compile reason as
    ``sincos_2d_posembed`` (no embedded table constants)."""
    pos = jnp.arange(max_len, dtype=jnp.float32)[:, None]
    dim = jnp.arange(0, d_model, 2, dtype=jnp.float32)
    div = jnp.exp(-jnp.log(10000.0) * dim / d_model)
    ang = pos * div
    # interleave: sin at even columns, cos at odd
    return jnp.stack([jnp.sin(ang), jnp.cos(ang)], axis=-1).reshape(
        max_len, d_model
    )


class Mlp(nn.Module):
    hidden_features: int
    out_features: int
    drop: float = 0.0
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        from ..ops.quant import maybe_dot_general

        dg = maybe_dot_general()
        x = nn.Dense(
            self.hidden_features, dtype=self.dtype, kernel_init=trunc_init,
            dot_general=dg,
        )(x)
        x = nn.gelu(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        x = nn.Dense(
            self.out_features, dtype=self.dtype, kernel_init=trunc_init,
            dot_general=dg,
        )(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        return x


class SelfAttention(nn.Module):
    """Fused-qkv multi-head self-attention (reference vision_transformer.py:40-81).

    Softmax in f32; qk/av matmuls in compute dtype for the MXU.
    """

    dim: int
    num_heads: int
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        from ..ops.quant import maybe_dot_general

        dg = maybe_dot_general()
        B, N, C = x.shape
        head_dim = self.dim // self.num_heads
        scale = head_dim**-0.5
        qkv = nn.Dense(
            self.dim * 3,
            use_bias=self.qkv_bias,
            dtype=self.dtype,
            kernel_init=trunc_init,
            dot_general=dg,
        )(x)
        qkv = qkv.reshape(B, N, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, N, H, hd)
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) * scale
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        # capturable attention probs for rollout viz (reference hooks on
        # attn_drop, vit_visualize.py:45-50); retrieved via
        # apply(..., mutable=['intermediates'])
        self.sow("intermediates", "attn_probs", attn)
        attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, C)
        out = nn.Dense(
            self.dim, dtype=self.dtype, kernel_init=trunc_init, dot_general=dg
        )(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return out


class DropPath(nn.Module):
    """Stochastic depth (reference droppath.py:6-40)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


class Block(nn.Module):
    """Pre-LN transformer block (reference vision_transformer.py:84-122)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        # tensor-parallel boundary: (B, N, C) activations are batch-sharded
        # between blocks; within a block XLA shards the qkv/mlp matmuls per
        # the column-parallel weight rules (parallel/mesh.py:_param_spec)
        from ..parallel.mesh import DATA_AXIS, shard_activation

        x = shard_activation(x, (DATA_AXIS, None, None))
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32)(x)
        h = SelfAttention(
            self.dim,
            self.num_heads,
            attn_drop=self.attn_drop,
            proj_drop=self.drop,
            dtype=self.dtype,
        )(h, deterministic)
        x = x + DropPath(self.drop_path)(h, deterministic)
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32)(x)
        h = Mlp(
            int(self.dim * self.mlp_ratio), self.dim, drop=self.drop, dtype=self.dtype
        )(h, deterministic)
        x = x + DropPath(self.drop_path)(h, deterministic)
        x = shard_activation(x, (DATA_AXIS, None, None))
        return x


class GatedSum(nn.Module):
    """Sigmoid-gated blend of two tensors (reference gated_sum.py:4-36)."""

    @nn.compact
    def __call__(self, a, b):
        gate = nn.Dense(1)(jnp.concatenate([a, b], axis=-1))
        g = jax.nn.sigmoid(gate)
        return g * a + (1.0 - g) * b


def posenc_1d(max_len: int, d_model: int) -> jax.Array:
    """1D sin-cos PE over sequence positions (reference
    PositionalEncoding1D, postional_encoding.py:137-168)."""
    return word_posenc(max_len, d_model)


def posenc_2d_hw(h: int, w: int, d_model: int) -> jax.Array:
    """h/w-split sin-cos 2D PE (reference PositionalEncoding2D,
    postional_encoding.py:91-134): first half of channels encodes height,
    second half width.  Returns (h, w, d_model) float32."""
    assert d_model % 2 == 0
    half = d_model // 2
    pe_h = word_posenc(h, half)          # (h, half)
    pe_w = word_posenc(w, half)          # (w, half)
    return jnp.concatenate(
        [
            jnp.broadcast_to(pe_h[:, None, :], (h, w, half)),
            jnp.broadcast_to(pe_w[None, :, :], (h, w, half)),
        ],
        axis=-1,
    )


class Adaptive2DPositionalEncoding(nn.Module):
    """SATRN adaptive 2D PE (reference postional_encoding.py:11-88):
    sin-cos h/w tables scaled per sample by learned alpha factors from a
    globally-pooled 2-layer MLP."""

    d_model: int
    max_h: int = 256
    max_w: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, C) -> x + adaptive PE."""
        B, H, W, C = x.shape
        half = self.d_model
        pe_h = jnp.asarray(word_posenc(self.max_h, self.d_model))[:H]  # (H, C)
        pe_w = jnp.asarray(word_posenc(self.max_w, self.d_model))[:W]  # (W, C)

        pooled = x.mean(axis=(1, 2))  # (B, C)

        def scale_mlp(name):
            h = nn.Dense(self.d_model // 2, dtype=self.dtype, name=f"{name}_fc1")(pooled)
            h = nn.relu(h)
            h = nn.Dense(self.d_model, dtype=self.dtype, name=f"{name}_fc2")(h)
            return jax.nn.sigmoid(h)  # (B, C)

        alpha_h = scale_mlp("h")[:, None, None, :]
        alpha_w = scale_mlp("w")[:, None, None, :]
        return (
            x
            + alpha_h * pe_h[None, :, None, :].astype(x.dtype)
            + alpha_w * pe_w[None, None, :, :].astype(x.dtype)
        )


class PosConv(nn.Module):
    """PEG positional encoding generator (reference postional_encoding.py:
    174-219): depthwise 3x3 conv over the 2D token grid, residual add."""

    dim: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, grid_hw):
        """x: (B, N, C) tokens (no cls); grid_hw = (h, w)."""
        B, N, C = x.shape
        h, w = grid_hw
        feat = x.reshape(B, h, w, C)
        out = nn.Conv(
            self.dim, (3, 3), strides=(self.stride, self.stride),
            feature_group_count=C, dtype=self.dtype,
        )(feat)
        if self.stride == 1:
            out = out + feat
        return out.reshape(B, -1, self.dim)
