"""Beam decode attention (self- and cross-) for the TFM head.

The TFM decode step needs, per layer, attention of K beam queries per
sample against an (M, nh, hd) key/value buffer — the slot-folded KV cache
(M = Tmax*K positions, see ``models/decoder_tfm.TFMState``) or the shared
encoder memory (M = S).  The arithmetic intensity is tiny (K=5 queries,
hd=32), so the op is a pure HBM stream over K/V.

Semantics (f32 softmax):
    scores[b,k,h,m] = sum_d q[b,k,h,d] * k[b,m,h,d]
    scores = where(mask[b,k,m], scores, -inf)        # mask optional
    attn   = softmax_m(scores)
    ctx[b,k,h,d] = sum_m attn[b,k,h,m] * v[b,m,h,d]

MEASURED VERDICT (v5e-1, batch 256, beam 5, M=755, 3 layers x 150 steps,
tools/tfm_decode_profile.py): the default path is the jnp
broadcast-multiply-reduce below — XLA fuses it into streaming passes
(~330 GB/s in-loop).  The Pallas kernel (enable with
``DOC2TEX_PALLAS_DECODE=1``) is numerically exact vs the reference but
LOSES at these shapes: one grid program per sample leaves the per-program
MXU/VPU work too small (16 tiny per-head dots), measuring ~17 ms/step vs
~2 ms for the fused XLA form.  It is kept as the starting point for
larger-model shapes (d_model >= 1024, hd >= 128 lanes) where the
per-program dot is tile-sized and the XLA form starts materializing
broadcasts.  Equality oracle: ``tools/tfm_decode_profile.py --check``.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def _reference(q, k, v, mask, k_scale=None, v_scale=None):
    """Broadcast-multiply-reduce formulation (XLA-fusible streaming).

    The softmax runs over the MINOR axis of a transposed (B, K, nh, M)
    score tensor: softmax over the non-minor M of the untransposed
    layout measured ~2x slower (lane-inefficient cross-sublane reduce)
    despite saving the transposes.

    int8 K/V (``k_scale``/``v_scale`` given, shapes (B, M, nh)): the
    per-position scales are folded AROUND the reduces instead of
    dequantizing the (B, M, nh, hd) buffers first —
        scores[b,k,h,m] = (sum_d q*k_int8) * k_scale[b,m,h]
        ctx[b,k,h,d]    = sum_m (attn*v_scale[b,m,h]) * v_int8[b,m,h,d]
    exact algebra, hd x fewer scale multiplies, and the int8 buffers feed
    the streaming reduce directly (only the convert fuses in)."""
    f32 = jnp.float32
    dtype = q.dtype if v_scale is not None else v.dtype
    # (B, M, K, nh) <- sum_d (B,1,K,nh,hd) * (B,M,1,nh,hd)
    sc = (q[:, None] * k[:, :, None].astype(q.dtype)).astype(f32).sum(-1)
    if k_scale is not None:
        sc = sc * k_scale[:, :, None, :]
    sc = sc.transpose(0, 2, 3, 1)  # (B, K, nh, M)
    if mask is not None:
        sc = jnp.where(mask[:, :, None, :], sc, -jnp.inf)
    attn = jax.nn.softmax(sc, axis=-1).astype(dtype)
    aw = attn.transpose(0, 3, 1, 2)  # (B, M, K, nh)
    if v_scale is not None:
        aw = aw * v_scale[:, :, None, :].astype(dtype)
    return (aw[..., None] * v[:, :, None].astype(dtype)).sum(1)  # (B,K,nh,hd)


def _kernel(q_ref, k_ref, v_ref, mask_ref, out_ref):
    """One sample: q (K,nh,hd), k/v (M,nh,hd), mask (K,M) -> ctx (K,nh,hd).

    Unrolled per-head so VMEM intermediates are (M, K, hd) f32 per head
    (~0.5 MB at the bench shapes) instead of x nh — the whole-block form
    blew the 16 MB scoped-VMEM limit.  All f32 where Mosaic needs 32-bit
    (minor-dim inserts) or precision matters (softmax)."""
    f32 = jnp.float32
    m = mask_ref[0] if mask_ref is not None else None   # (K, M)
    nh = q_ref.shape[2]
    for h in range(nh):
        qh = q_ref[0, :, h, :]                          # (K, hd)
        kh = k_ref[0, :, h, :]                          # (M, hd)
        vh = v_ref[0, :, h, :]
        # MXU dots: contraction over hd / M keeps every intermediate at
        # (K, M) or (K, hd) with the LONG dim minor — VPU broadcast-reduce
        # forms had K(=5)-minor intermediates whose 128-lane padding
        # wasted 25x of the vector unit (measured 31 ms/step vs ~2 ms)
        sc = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        )                                               # (K, M) f32
        if m is not None:
            sc = jnp.where(m, sc, -jnp.inf)
        sc = sc - sc.max(axis=-1, keepdims=True)
        ex = jnp.exp(sc)
        attn = (ex / ex.sum(axis=-1, keepdims=True)).astype(vh.dtype)
        ctx = jax.lax.dot_general(
            attn, vh, (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )                                               # (K, hd)
        # output is head-major (1, nh, K, hd): the store only inserts
        # MAJOR dims ((K,hd) -> (1,1,K,hd)), which is a layout no-op —
        # a strided (1,K,1,hd) store needs a bf16 relayout Mosaic rejects
        out_ref[0, h] = ctx.astype(out_ref.dtype)


def decode_attention(q, k, v, mask=None, force_reference: bool = False,
                     k_scale=None, v_scale=None):
    """Beam decode attention.

    q: (B, K, nh, hd) queries (pre-scaled by 1/sqrt(hd) if desired)
    k, v: (B, M, nh, hd) keys/values — bf16, or int8 with per-position
        ``k_scale``/``v_scale`` (B, M, nh) f32 (ops/quant.quantize_kv);
        scales fold around the reduces (see ``_reference``)
    mask: optional (B, K, M) bool — True = attend
    returns ctx (B, K, nh, hd) in v.dtype (q.dtype when quantized)

    NOT @jax.jit on purpose: callers trace this inside their own jit
    (the decode scan body), and a nested-jit call boundary here blocked
    XLA from fusing the streaming reduce with its neighbours — measured
    3x on the full decode step.
    """
    use_pallas = (
        not force_reference
        and k_scale is None and v_scale is None
        and jax.default_backend() == "tpu"
        and os.environ.get("DOC2TEX_PALLAS_DECODE") == "1"
    )
    if not use_pallas:
        return _reference(q, k, v, mask, k_scale=k_scale, v_scale=v_scale)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, K, nh, hd = q.shape
    M = k.shape[1]

    if mask is None:
        kernel = lambda qr, kr, vr, orf: _kernel(qr, kr, vr, None, orf)
        in_specs = [
            pl.BlockSpec((1, K, nh, hd), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, nh, hd), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, nh, hd), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        args = (q, k, v)
    else:
        kernel = _kernel
        in_specs = [
            pl.BlockSpec((1, K, nh, hd), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, nh, hd), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, nh, hd), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, M), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        args = (q, k, v, mask)

    ctx = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, nh, K, hd), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, nh, K, hd), v.dtype),
    )(*args)
    return ctx.transpose(0, 2, 1, 3)  # -> (B, K, nh, hd), ~300 KB
