"""Pallas TPU kernel: fused coverage-attention decode step.

The per-token hot op of the LSTM-attention decoder
(``models/decoder_lstm.py:step``, reference cell
``attention1D.py:121-161``):

    e       = tanh(enc_proj + q[:, None, :] + loc_feat @ w_loc + b_loc) @ w_score
    alpha   = softmax(e)
    context = einsum('bs,bsd->bd', alpha, enc)

Unfused, XLA materializes two (B, S, H) f32 intermediates in HBM per decode
step (the loc projection and the tanh input), plus the (B, S) scores — at
S~83, H=256, B*K=640 that's ~2x54 MB of HBM traffic per step, 151 steps per
decode.  This kernel keeps the whole chain in VMEM per batch block: one
HBM read of enc/enc_proj/loc_feat, one write of (context, alpha).

Masking: scores at padded positions (s >= valid_len) get -inf before the
softmax so bucket padding never receives attention mass.

MEASURED VERDICT (v5e-1, B=640, S=83, H=256, K=128, 151-step scan): the
XLA-fused reference path runs 31.4 ms vs 125.8 ms for this kernel — the
VMEM ceiling forces block_b<=16, serializing the grid and starving the MXU,
while XLA keeps the whole step in one well-tiled fusion.  The decoder
therefore uses the jnp path (``attention_step_reference`` math inline in
``models/decoder_lstm.py``); this kernel is kept as a tested, documented
Pallas implementation of the op and a baseline for future kernel work
(e.g. double-buffered DMA over S, or fusing the LSTM gates in as well).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(
    enc_ref,        # (BB, S, D)  compute dtype
    enc_proj_ref,   # (BB, S, H)
    q_ref,          # (BB, H)
    loc_ref,        # (BB, S, K)
    w_loc_ref,      # (K, H)
    b_loc_ref,      # (1, H)
    w_score_ref,    # (H, 1)
    mask_ref,       # (1, S)  f32: 0 valid, -inf padded
    ctx_ref,        # (BB, D) out
    alpha_ref,      # (BB, S) out
):
    BB, S, H = enc_proj_ref.shape
    D = enc_ref.shape[-1]
    K = loc_ref.shape[-1]

    loc2 = loc_ref[:].reshape(BB * S, K)
    locH = jnp.dot(
        loc2, w_loc_ref[:], preferred_element_type=jnp.float32
    ).reshape(BB, S, H)
    x = jnp.tanh(
        enc_proj_ref[:].astype(jnp.float32)
        + locH
        + b_loc_ref[0][None, None, :]
        + q_ref[:].astype(jnp.float32)[:, None, :]
    )
    e = jnp.dot(
        x.reshape(BB * S, H), w_score_ref[:], preferred_element_type=jnp.float32
    )
    e = e.reshape(BB, S) + mask_ref[0][None, :]
    e = e - jnp.max(e, axis=-1, keepdims=True)
    ex = jnp.exp(e)
    alpha = ex / jnp.sum(ex, axis=-1, keepdims=True)
    alpha_ref[:] = alpha
    # batched (BB,S)x(BB,S,D) contraction as a VPU multiply-reduce (Mosaic
    # rejects batch dims in dot_general here)
    ctx_ref[:] = jnp.sum(
        alpha[:, :, None] * enc_ref[:].astype(jnp.float32), axis=1
    )


def attention_step_reference(enc, enc_proj, q, loc_feat, w_loc, b_loc, w_score,
                             valid_len=None):
    """Pure-jnp reference (identical math, used on CPU and in tests)."""
    locH = loc_feat.astype(jnp.float32) @ w_loc + b_loc
    x = jnp.tanh(enc_proj.astype(jnp.float32) + q.astype(jnp.float32)[:, None, :] + locH)
    e = (x @ w_score)[..., 0]
    if valid_len is not None:
        S = e.shape[-1]
        mask = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1) < valid_len
        e = jnp.where(mask, e, NEG_INF)
    alpha = jax.nn.softmax(e, axis=-1)
    context = jnp.einsum("bs,bsd->bd", alpha, enc.astype(jnp.float32))
    return context, alpha


@functools.partial(jax.jit, static_argnames=("block_b", "interpret"))
def fused_attention_step(
    enc, enc_proj, q, loc_feat, w_loc, b_loc, w_score,
    valid_len=None, block_b: int = 64, interpret: bool = False,
):
    """Fused attention step.

    enc (B, S, D); enc_proj (B, S, H); q (B, H); loc_feat (B, S, K);
    w_loc (K, H); b_loc (H,); w_score (H,) or (H, 1).
    Returns (context (B, D) f32, alpha (B, S) f32).
    """
    B, S, D = enc.shape
    H = enc_proj.shape[-1]
    K = loc_feat.shape[-1]
    w_score = w_score.reshape(H, 1)
    b_loc2 = b_loc.reshape(1, H).astype(jnp.float32)

    if valid_len is None:
        mask = jnp.zeros((1, S), jnp.float32)
    else:
        idx = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
        mask = jnp.where(idx < valid_len, 0.0, NEG_INF).astype(jnp.float32)

    bb = min(block_b, B)
    # pad B to a multiple of the block
    pad = (-B) % bb
    if pad:
        enc = jnp.pad(enc, ((0, pad), (0, 0), (0, 0)))
        enc_proj = jnp.pad(enc_proj, ((0, pad), (0, 0), (0, 0)))
        q = jnp.pad(q, ((0, pad), (0, 0)))
        loc_feat = jnp.pad(loc_feat, ((0, pad), (0, 0), (0, 0)))
    Bp = B + pad

    grid = (Bp // bb,)
    ctx, alpha = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bb, S, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, S, H), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, H), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, S, K), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bb, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, D), jnp.float32),
            jax.ShapeDtypeStruct((Bp, S), jnp.float32),
        ],
        interpret=interpret,
    )(enc, enc_proj, q, loc_feat, w_loc.astype(jnp.float32), b_loc2,
      w_score.astype(jnp.float32), mask)
    return ctx[:B], alpha[:B]
