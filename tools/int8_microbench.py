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

Run on the real chip (TPU must be otherwise idle — single chip):
    python tools/int8_microbench.py

Timing protocol per CLAUDE.md: block_until_ready is unreliable over the
tunnel, so sync via scalar readback and subtract the ~25 ms host RTT by
timing a no-op readback first.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

REPS = 8


def _sync(x) -> None:
    # scalar readback forces completion over the tunnel
    _ = int(jnp.ravel(x)[0].astype(jnp.int32))


def time_fn(fn, *args) -> float:
    """Median seconds over REPS, warmup first, RTT subtracted."""
    out = fn(*args)
    _sync(out)  # compile + warmup
    # measure readback RTT on an already-materialized scalar
    t0 = time.perf_counter()
    _sync(out)
    rtt = time.perf_counter() - t0
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        o = fn(*args)
        _sync(o)
        times.append(time.perf_counter() - t0 - rtt)
    return float(np.median(times))


# ---------------------------------------------------------------- matmul
@jax.jit
def mm_bf16(a, b):
    return jax.lax.dot(a, b, preferred_element_type=jnp.float32)


@jax.jit
def mm_int8_raw(a8, b8):
    return jax.lax.dot(a8, b8, preferred_element_type=jnp.int32)


@jax.jit
def mm_int8_dynamic(a, b):
    # per-tensor activation scale, per-column weight scale (the scheme
    # ops/quant.py uses), all fused into one jit
    sa = jnp.max(jnp.abs(a)) / 127.0
    a8 = jnp.clip(jnp.round(a / sa), -127, 127).astype(jnp.int8)
    sb = jnp.max(jnp.abs(b), axis=0, keepdims=True) / 127.0
    b8 = jnp.clip(jnp.round(b / sb), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot(a8, b8, preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * sa * sb


# ---------------------------------------------------------------- conv
def conv(x, k, dtype_out):
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=dtype_out,
    )


conv_bf16 = jax.jit(functools.partial(conv, dtype_out=jnp.float32))
conv_int8 = jax.jit(functools.partial(conv, dtype_out=jnp.int32))


@jax.jit
def conv_int8_dynamic(x, k):
    sx = jnp.max(jnp.abs(x)) / 127.0
    x8 = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)
    sk = jnp.max(jnp.abs(k), axis=(0, 1, 2), keepdims=True) / 127.0
    k8 = jnp.clip(jnp.round(k / sk), -127, 127).astype(jnp.int8)
    acc = conv(x8, k8, jnp.int32)
    return acc.astype(jnp.float32) * sx * jnp.squeeze(sk, (0, 1))


def main():
    key = jax.random.PRNGKey(0)
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")

    # --- matmul: MXU-saturating square case
    for n in (4096, 8192):
        a = jax.random.normal(key, (n, n), jnp.bfloat16)
        b = jax.random.normal(key, (n, n), jnp.bfloat16)
        a8 = jnp.clip(jnp.round(a.astype(jnp.float32) * 10), -127, 127).astype(jnp.int8)
        b8 = jnp.clip(jnp.round(b.astype(jnp.float32) * 10), -127, 127).astype(jnp.int8)
        flops = 2 * n**3
        t_bf = time_fn(mm_bf16, a, b)
        t_i8 = time_fn(mm_int8_raw, a8, b8)
        t_dy = time_fn(mm_int8_dynamic, a.astype(jnp.float32), b.astype(jnp.float32))
        print(
            f"matmul {n}x{n}: bf16 {t_bf*1e3:.2f}ms ({flops/t_bf/1e12:.1f}T) | "
            f"int8-raw {t_i8*1e3:.2f}ms ({flops/t_i8/1e12:.1f}T, {t_bf/t_i8:.2f}x) | "
            f"int8-dyn {t_dy*1e3:.2f}ms ({t_bf/t_dy:.2f}x)"
        )

    # --- convs at flagship encoder hot shapes (B=256, 64x320 input)
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
        t_bf = time_fn(conv_bf16, x, k)
        try:
            t_i8 = time_fn(conv_int8, x8, k8)
            msg_i8 = f"int8-raw {t_i8*1e3:.2f}ms ({t_bf/t_i8:.2f}x)"
        except Exception as e:  # int8 conv may not lower on all backends
            msg_i8 = f"int8-raw FAILED ({type(e).__name__})"
        try:
            t_dy = time_fn(conv_int8_dynamic, x.astype(jnp.float32), k.astype(jnp.float32))
            msg_dy = f"int8-dyn {t_dy*1e3:.2f}ms ({t_bf/t_dy:.2f}x)"
        except Exception as e:
            msg_dy = f"int8-dyn FAILED ({type(e).__name__})"
        print(
            f"conv {b}x{h}x{w}x{cin}->{cout}: bf16 {t_bf*1e3:.2f}ms "
            f"({flops/t_bf/1e12:.1f}T) | {msg_i8} | {msg_dy}"
        )


if __name__ == "__main__":
    main()
