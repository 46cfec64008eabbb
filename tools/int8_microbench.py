"""Microbenchmark: int8 vs bf16 matmul/conv on the real TPU (v5e).

Motivation: the flagship encoder is compute-bound at ~84% of bf16 peak
(CLAUDE.md perf facts), so the only remaining headline lever is a higher
peak — v5e's MXU has ~2x int8 throughput vs bf16.  This tool answers, on
the actual chip through the actual XLA stack:

  1. does lax.dot_general(int8, int8, preferred_element_type=int32) lower
     to the native int8 MXU path (i.e. run ~2x faster than bf16)?
  2. does lax.conv_general_dilated do the same for int8 convs?
  3. how much does *dynamic* quantization (abs-max + scale + round, fused
     into the same jit) eat of that win?

Timing protocol: single-op device times (2-7 ms) drown in the ~25 ms
tunnel RTT, so each measurement runs the op K times inside ONE jit via
lax.fori_loop — the input is perturbed per iteration (cheap elementwise
op) so XLA cannot hoist the matmul out of the loop, and the loop carries
a full reduction of each product so nothing is dead-code-eliminated.
One scalar readback syncs the whole thing; per-op time = total / K.

Run on the real chip (TPU must be otherwise idle — single chip):
    python tools/int8_microbench.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

K = 24  # ops per timed jit: K * ~3ms >> 25ms RTT


def _perturb(x, i):
    if x.dtype == jnp.int8:
        return jnp.bitwise_xor(x, (i & 1).astype(jnp.int8))
    return x * (1.0 + i.astype(x.dtype) * jnp.asarray(1e-6, x.dtype))


def timed_loop(op, x, w, reps: int = 3) -> float:
    """Seconds per single op: K-iteration fori_loop in one jit, best of reps."""

    @jax.jit
    def run(x, w):
        def body(i, acc):
            out = op(_perturb(x, i), w)
            return acc + jnp.sum(out.astype(jnp.float32))

        return lax.fori_loop(0, K, body, jnp.float32(0))

    _ = float(run(x, w))  # compile + warmup
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(run(x, w))
        best = min(best, time.perf_counter() - t0)
    return best / K


# ---------------------------------------------------------------- ops
def mm_plain(a, b):
    acc = jnp.int32 if a.dtype == jnp.int8 else jnp.float32
    return lax.dot(a, b, preferred_element_type=acc)


def mm_dynamic(a, b):
    # the ops/quant.py scheme: per-tensor lhs scale, per-column rhs scale
    sa = jnp.max(jnp.abs(a)) / 127.0
    a8 = jnp.clip(jnp.round(a / sa), -127, 127).astype(jnp.int8)
    sb = jnp.max(jnp.abs(b), axis=0, keepdims=True) / 127.0
    b8 = jnp.clip(jnp.round(b / sb), -127, 127).astype(jnp.int8)
    acc = lax.dot(a8, b8, preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * sa * sb


def conv_plain(x, k):
    acc = jnp.int32 if x.dtype == jnp.int8 else jnp.float32
    return lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=acc,
    )


def conv_dynamic(x, k):
    sx = jnp.max(jnp.abs(x)) / 127.0
    x8 = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)
    sk = jnp.max(jnp.abs(k), axis=(0, 1, 2), keepdims=True) / 127.0
    k8 = jnp.clip(jnp.round(k / sk), -127, 127).astype(jnp.int8)
    acc = conv_plain(x8, k8)
    return acc.astype(jnp.float32) * sx * jnp.squeeze(sk, (0, 1))


def main():
    key = jax.random.PRNGKey(0)
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}  (K={K})")

    for n in (4096, 8192):
        a = jax.random.normal(key, (n, n), jnp.bfloat16)
        b = jax.random.normal(key, (n, n), jnp.bfloat16)
        a8 = jnp.clip(jnp.round(a.astype(jnp.float32) * 10), -127, 127).astype(jnp.int8)
        b8 = jnp.clip(jnp.round(b.astype(jnp.float32) * 10), -127, 127).astype(jnp.int8)
        flops = 2 * n**3
        t_bf = timed_loop(mm_plain, a, b)
        t_i8 = timed_loop(mm_plain, a8, b8)
        t_dy = timed_loop(mm_dynamic, a.astype(jnp.bfloat16), b.astype(jnp.bfloat16))
        print(
            f"matmul {n}x{n}: bf16 {t_bf*1e3:.2f}ms ({flops/t_bf/1e12:.0f}T) | "
            f"int8-raw {t_i8*1e3:.2f}ms ({flops/t_i8/1e12:.0f}T, {t_bf/t_i8:.2f}x) | "
            f"int8-dyn {t_dy*1e3:.2f}ms ({t_bf/t_dy:.2f}x)"
        )

    # convs at flagship encoder hot shapes (B=256, 64x320 input)
    for (b, h, w, cin, cout) in (
        (256, 32, 160, 64, 128),    # layer1-ish
        (256, 16, 80, 128, 256),    # layer2-ish
        (256, 8, 81, 512, 512),     # layer3/4 (5+3 blocks — the bulk)
    ):
        x = jax.random.normal(key, (b, h, w, cin), jnp.bfloat16)
        k = jax.random.normal(key, (3, 3, cin, cout), jnp.bfloat16)
        x8 = jnp.clip(jnp.round(x.astype(jnp.float32) * 10), -127, 127).astype(jnp.int8)
        k8 = jnp.clip(jnp.round(k.astype(jnp.float32) * 10), -127, 127).astype(jnp.int8)
        flops = 2 * b * h * w * cin * cout * 9
        t_bf = timed_loop(conv_plain, x, k)
        try:
            t_i8 = timed_loop(conv_plain, x8, k8)
            msg_i8 = f"int8-raw {t_i8*1e3:.2f}ms ({t_bf/t_i8:.2f}x)"
        except Exception as e:  # int8 conv may not lower on all backends
            msg_i8 = f"int8-raw FAILED ({type(e).__name__})"
        try:
            t_dy = timed_loop(conv_dynamic, x, k)
            msg_dy = f"int8-dyn {t_dy*1e3:.2f}ms ({t_bf/t_dy:.2f}x)"
        except Exception as e:
            msg_dy = f"int8-dyn FAILED ({type(e).__name__})"
        print(
            f"conv {b}x{h}x{w}x{cin}->{cout}: bf16 {t_bf*1e3:.2f}ms "
            f"({flops/t_bf/1e12:.0f}T) | {msg_i8} | {msg_dy}"
        )


if __name__ == "__main__":
    main()
