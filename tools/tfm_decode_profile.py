"""Component-level timing of the TFM KV-cache beam decode on the real chip.

Isolates where the decode step's time goes at the bench.py --tfm shapes
(batch 256, beam 5, 64x320, max_len 150): encoder, init_state, a bare
step_fn loop (KV-cache attention + cache update), a bare beam-shuffle
loop, and the full beam_decode — each as ONE compiled fori_loop program
so tunnel dispatch (~25 ms RTT) is paid once per measurement.

Usage: python tools/tfm_decode_profile.py [--steps 150] [--batch 256]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--beam", type=int, default=5)
    ap.add_argument("--check", action="store_true",
                    help="compare the pallas decode-attention kernel "
                    "against the jnp reference on this backend")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from __graft_entry__ import _flagship_config
    from doc2tex_tpu.decode.beam import beam_decode, tfm_gather
    from doc2tex_tpu.models import build_model
    from doc2tex_tpu.tokenizer.converters import TFMLabelConverter
    from doc2tex_tpu.train.trainer import init_model

    B, K, T = args.batch, args.beam, args.steps
    H, W = 64, 320

    cfg = _flagship_config(tiny=False)
    cfg["batch_max_length"] = T
    cfg["Prediction"] = {
        "name": "TFM",
        "params": {
            "d_model": 256, "nhead": 8, "num_decoder_layers": 3,
            "dim_feedforward": 1024, "dropout": 0.1,
        },
    }
    conv = TFMLabelConverter(cfg["character"])
    model = build_model(cfg, conv.num_classes)
    params, batch_stats = init_model(
        model, jax.random.PRNGKey(0), (B, H, W, 1), T + 1
    )
    variables = {"params": params, "batch_stats": batch_stats}

    x = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (B, H, W, 1), np.uint8)
    ).astype(jnp.float32) / 255.0

    # measure the tunnel RTT instead of assuming it: it varies 25-40 ms
    # run-to-run (see bench.py), which would be a 30-50% error on the
    # short component timings below
    tiny = jax.jit(lambda v: v + 1)
    _ = float(tiny(jnp.float32(0)))
    rtt = float("inf")
    for i in range(5):
        t0 = time.perf_counter()
        _ = float(tiny(jnp.float32(i)))
        rtt = min(rtt, time.perf_counter() - t0)
    print(f"tunnel rtt: {rtt*1e3:.0f} ms", flush=True)

    def timeit(name, fn, *a):
        # every fn returns a SCALAR (tunnel transfers are ~40 MB/s; pulling
        # a cache-sized array would swamp the measurement)
        float(fn(*a))  # compile + warm
        t0 = time.perf_counter()
        out = float(fn(*a))
        dt = (time.perf_counter() - t0 - rtt) * 1e3
        print(f"{name:34s} {dt:9.1f} ms", flush=True)
        return out

    # ---- pallas decode-attention kernel vs jnp reference (on-chip oracle)
    if args.check:
        from doc2tex_tpu.ops.decode_attention import decode_attention

        rng = np.random.default_rng(0)
        Bc, Kc, nhc, hdc, Mc = 8, args.beam, 8, 32, 64
        qa = jnp.asarray(rng.normal(size=(Bc, Kc, nhc, hdc)), jnp.bfloat16)
        ka = jnp.asarray(rng.normal(size=(Bc, Mc, nhc, hdc)), jnp.bfloat16)
        va = jnp.asarray(rng.normal(size=(Bc, Mc, nhc, hdc)), jnp.bfloat16)
        mk = jnp.asarray(rng.random((Bc, Kc, Mc)) < 0.7)
        mk = mk.at[:, :, 0].set(True)  # no all-masked rows
        for m in (None, mk):
            got = np.asarray(
                decode_attention(qa, ka, va, m), np.float32
            )
            want = np.asarray(
                decode_attention(qa, ka, va, m, force_reference=True),
                np.float32,
            )
            err = np.abs(got - want).max()
            tag = "mask" if m is not None else "none"
            print(f"pallas vs reference ({tag}): max|d| = {err:.5f}")
            # bf16 rounding bound: the REFERENCE casts attention weights
            # to bf16 before the value sum (the kernel keeps f32), so on
            # N(0,1) values differences up to ~2^-4 * max|v| are expected
            assert err < 0.08, "pallas kernel mismatch"

    # ---- encoder
    enc_fn = jax.jit(lambda v, x: model.apply(v, x, method="encode"))
    enc = jax.block_until_ready(enc_fn(variables, x))
    timeit(
        "encode (B,H,W)",
        jax.jit(lambda v, x: enc_fn(v, x).sum()), variables, x,
    )
    print(f"{'':34s} enc shape {enc.shape}")

    # ---- init_state (keep a live copy for the loops below)
    init_fn = jax.jit(
        lambda v, e: model.apply(v, e, T, K, method="init_decode_state")
    )
    state = init_fn(variables, enc)
    timeit(
        "init_decode_state",
        jax.jit(lambda v, e: init_fn(v, e).k_cache[0].sum()), variables, enc,
    )

    # ---- bare step loop (no beam logic, fixed tokens)
    toks = jnp.ones((B * K,), jnp.int32)

    @jax.jit
    def step_loop(v, s):
        # accumulate logits.sum() so EVERY layer's work stays live: with
        # per-layer cache leaves, reading back only layer-0's cache lets
        # XLA DCE the whole attention/FFN chain (layer 0's K/V depend
        # only on the token embedding)
        def body(_, carry):
            s, acc = carry
            s, logits = model.apply(v, s, toks, method="decode_step")
            return s, acc + logits.sum()
        _, acc = jax.lax.fori_loop(0, T, body, (s, jnp.float32(0)))
        return acc

    timeit(f"step_fn x{T} (no beam logic)", step_loop, variables, state)

    # ---- bare beam-shuffle loop
    idx = jnp.tile(jnp.arange(K, dtype=jnp.int32)[::-1][None], (B, 1))

    @jax.jit
    def gather_loop(s):
        def body(_, s):
            return tfm_gather(s, idx, B, K)
        return jax.lax.fori_loop(0, T, body, s).sel.sum()

    timeit(f"beam shuffle x{T}", gather_loop, state)

    # ---- full beam decode
    @jax.jit
    def full(v, e):
        s = model.apply(v, e, T, K, method="init_decode_state")
        def step(st, tk):
            return model.apply(v, st, tk, method="decode_step")
        toks_out, scores = beam_decode(step, s, tfm_gather, B, K, T,
                                       start_token=1, end_token=2, pad_token=0)
        return toks_out.sum()

    timeit("full beam_decode", full, variables, enc)


if __name__ == "__main__":
    main()
