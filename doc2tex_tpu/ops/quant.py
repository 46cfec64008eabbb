"""Dynamic int8 quantization for inference-time encoder matmuls/convs.

The flagship encoder is compute-bound at ~84% of v5e bf16 peak, so the one
remaining headline lever is the MXU's ~2x int8 throughput.  This module
implements *dynamic* symmetric int8 quantization fused into the op:

  - activations: per-tensor abs-max scale, computed on the fly
  - weights:     per-output-channel abs-max scale
  - accumulate in int32 on the MXU, rescale to the original dtype

No parameter-tree changes: checkpoints stay identical, the quantized path
is injected through flax's ``nn.Dense(dot_general=...)`` /
``nn.Conv(conv_general_dilated=...)`` hooks at *trace* time via the
``quantized_inference()`` context manager.  Training is never quantized —
the context is only entered around inference traces (bench/decode), and
rounding would break gradients anyway.

The reference has no quantization path at all (torch fp32 CPU inference,
``doc2tex/tools/create_dataset/...`` none); this is a TPU-native extension
justified by the v5e MXU int8 peak.  Measured speed/accuracy tradeoffs are
recorded in BASELINE.md (int8 rows) and tools/int8_microbench.py.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_EPS = 1e-8

# Shape gates, from tools/int8_microbench.py on v5e-1: int8 wins only when
# both matmul dims tile well onto the int8 MXU ((32, 128) min tile) —
# the 64->128 early conv REGRESSES to 0.72x while the 512->512 deep conv
# gains 1.39x.  Ops below these sizes fall through to the bf16 path.
MIN_CONTRACT = 256   # contraction dim (kh*kw*cin for convs)
MIN_OUT = 128        # output-channel dim

# stack, mirroring parallel.mesh's activation-mesh context pattern
_QUANT_STACK: list = []


class quantized_inference:
    """Context manager: model parts traced inside it run int8
    dynamic-quantized.  Trace-time only — wrap the ``jax.jit`` trace
    (first call), not the steady-state calls.

    ``parts``:
      - "encoder": Dense/Conv matmuls/convs go int8 on the MXU (shape-gated)
      - "decoder_mem": decode-step attention MEMORY (quantized once at
        decode start, zero per-step cost) is stored int8; dequant/scale
        folding fuses into the consumers.  LSTM family: enc / enc_proj in
        ``DecoderState``.  TFM family: the beam-shared cross-attention
        K/V memory (per-vector scales, ``quantize_kv``) in ``TFMState``.
      - "decoder_kv": TFM family only — the GROWING self-attention KV
        caches also go int8 (per-vector scales, quantize+slice-update
        every step).  MEASURED VERDICT (v5e-1, bench --tfm, 64x320
        beam 5): a LOSS at the flagship shapes — 814.4 img/s bf16 caches
        vs 651.6 int8 (folded scales) / 641.7 (dequant-before-dot).  At
        (nh=8, hd=32) cache minors, int8's (32,128) TPU tile padding
        cancels the byte saving, so the per-step quantize + scale
        plumbing is pure overhead.  Kept for large-model shapes
        (hd >= 128 lanes) where the tiles fill and int8 genuinely halves
        the stream.
    """

    def __init__(self, mode: str = "int8", parts=("encoder",)):
        if mode not in ("int8",):
            raise ValueError(f"unknown quant mode {mode!r}")
        bad = set(parts) - {"encoder", "decoder_mem", "decoder_kv"}
        if bad:
            raise ValueError(f"unknown quant parts {sorted(bad)}")
        self.mode = mode
        self.parts = frozenset(parts)

    def __enter__(self):
        _QUANT_STACK.append((self.mode, self.parts))
        return self

    def __exit__(self, *exc):
        _QUANT_STACK.pop()
        return False


def parts_for_mode(mode) -> Optional[tuple]:
    """Map the config-surface ``quantize:`` mode string to the parts tuple
    for :class:`quantized_inference` (None = unquantized).  The single
    source of truth for every CLI/config entry point (recognition flow,
    api/infer, bench) — ``decoder_kv`` is deliberately in NO mode: int8
    growing KV caches are a measured loss at hd=32 flagship shapes (see
    the class docstring verdict); callers opt in explicitly for hd>=128."""
    return {
        "int8": ("encoder",),
        "int8_full": ("encoder", "decoder_mem"),
    }.get(str(mode or ""))


def active_quant_mode() -> Optional[str]:
    return _QUANT_STACK[-1][0] if _QUANT_STACK else None


def quant_part_active(part: str) -> bool:
    """True when a quantized_inference() context covering ``part`` is
    active at trace time."""
    return bool(_QUANT_STACK) and part in _QUANT_STACK[-1][1]


def _quantize(x: jax.Array, axes) -> tuple[jax.Array, jax.Array]:
    """Symmetric int8 quantization; scale reduced over ``axes``.

    Returns (int8 values, float32 scale broadcastable against x)."""
    xf = x.astype(jnp.float32)
    scale = jnp.max(jnp.abs(xf), axis=axes, keepdims=True) / 127.0
    scale = jnp.maximum(scale, _EPS)
    q = jnp.clip(jnp.round(xf / scale), -127.0, 127.0).astype(jnp.int8)
    return q, scale


# ---------------------------------------------------------------- dense
def int8_dot_general(lhs, rhs, dimension_numbers, precision=None,
                     preferred_element_type=None):
    """Drop-in for ``lax.dot_general`` in flax Dense: int8 MXU matmul with
    per-tensor lhs scale and per-output-channel rhs scale.

    Only the flax-Dense contraction pattern (last dim of lhs x dim 0 of
    rhs, no batch dims) gets the per-channel treatment; anything else
    falls back to per-tensor scales on both sides.
    """
    (lc, rc), (lb, rb) = dimension_numbers
    contract = int(np.prod([rhs.shape[d] for d in rc]))
    n_out = int(
        np.prod([rhs.shape[d] for d in range(rhs.ndim) if d not in rc and d not in rb])
    )
    if contract < MIN_CONTRACT or n_out < MIN_OUT:
        return lax.dot_general(
            lhs, rhs, dimension_numbers, precision=precision,
            preferred_element_type=preferred_element_type,
        )
    lq, ls = _quantize(lhs, axes=None)  # per-tensor
    dense_like = (
        not lb and not rb and tuple(lc) == (lhs.ndim - 1,) and tuple(rc) == (0,)
    )
    if dense_like:
        rq, rs = _quantize(rhs, axes=tuple(range(rhs.ndim - 1)))  # per-out-col
        rs_out = jnp.squeeze(rs, axis=tuple(range(rhs.ndim - 1)))
    else:
        rq, rs = _quantize(rhs, axes=None)
        rs_out = jnp.ravel(rs)[0]
    acc = lax.dot_general(
        lq, rq, dimension_numbers, precision=precision,
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * (jnp.ravel(ls)[0] * rs_out)
    return out.astype(lhs.dtype)


# ---------------------------------------------------------------- conv
def int8_conv_general_dilated(lhs, rhs, window_strides, padding,
                              lhs_dilation=None, rhs_dilation=None,
                              dimension_numbers=None, feature_group_count=1,
                              precision=None, preferred_element_type=None):
    """Drop-in for ``lax.conv_general_dilated`` in flax Conv (NHWC/HWIO):
    int8 conv with per-tensor input scale + per-output-channel kernel
    scale, int32 accumulation on the MXU."""
    # HWIO kernel: contraction = kh*kw*cin_per_group, out channels last
    contract = int(np.prod(rhs.shape[:-1]))
    if contract < MIN_CONTRACT or rhs.shape[-1] < MIN_OUT:
        return lax.conv_general_dilated(
            lhs, rhs, window_strides, padding,
            lhs_dilation=lhs_dilation, rhs_dilation=rhs_dilation,
            dimension_numbers=dimension_numbers,
            feature_group_count=feature_group_count,
            precision=precision, preferred_element_type=preferred_element_type,
        )
    lq, ls = _quantize(lhs, axes=None)
    # flax always passes HWIO kernels (out channels last)
    rq, rs = _quantize(rhs, axes=tuple(range(rhs.ndim - 1)))
    acc = lax.conv_general_dilated(
        lq, rq, window_strides, padding,
        lhs_dilation=lhs_dilation, rhs_dilation=rhs_dilation,
        dimension_numbers=dimension_numbers,
        feature_group_count=feature_group_count,
        precision=precision, preferred_element_type=jnp.int32,
    )
    # rs is (1,..,1,Cout) -> broadcast over the NHWC output's channel dim
    scale = jnp.ravel(ls)[0] * jnp.reshape(rs, (1,) * (acc.ndim - 1) + (-1,))
    out = acc.astype(jnp.float32) * scale
    return out.astype(lhs.dtype)


def maybe_dot_general():
    """For ``nn.Dense(dot_general=...)`` call sites: the quantized op when
    a quantized_inference() context covering the encoder is active at
    trace time, else None (flax falls through to lax.dot_general)."""
    return int8_dot_general if quant_part_active("encoder") else None


def maybe_conv_general():
    """For ``nn.Conv(conv_general_dilated=...)`` call sites."""
    return int8_conv_general_dilated if quant_part_active("encoder") else None


# ------------------------------------------------------- decoder memory
def quantize_memory(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-sample int8 quantization of a (B, S, D) attention memory.

    Returns (int8 values, f32 scale (B, 1, 1)).  Storing the decode-step
    attention memory int8 halves the reads that dominate decode HBM
    traffic (see decoder_lstm.init_state); the consumer dequantizes via
    ``dequantize_memory`` and XLA fuses the convert into the tanh/einsum.
    """
    q, scale = _quantize(x, axes=tuple(range(1, x.ndim)))
    return q, scale


def dequantize_memory(q: jax.Array, scale: jax.Array) -> jax.Array:
    return q.astype(jnp.float32) * scale


def quantize_kv(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-vector int8 quantization of attention K/V: one scale per
    leading-index vector (reduction over the LAST axis only).

    For a (B, M, nh, hd) cache/memory this yields int8 values plus a
    (B, M, nh) f32 scale — fine-grained enough that beam decode stays
    token-exact on trained weights in practice, while the f32 scale
    tensor is hd(x4-bytes-vs-1) = ~8x smaller than the bytes the int8
    storage saves.  Consumers dequantize inline
    (``q.astype(dtype) * scale[..., None]``); XLA fuses the convert +
    multiply into the streaming attention reduce, so HBM still sees
    only int8.
    """
    q, scale = _quantize(x, axes=(-1,))
    return q, jnp.squeeze(scale, axis=-1)
