"""Headline bench: batched beam-5 decode throughput on one chip.

Workload (kept in sync with tools/measure_torch_baseline.py, which produced
tools/baseline_measured.json by running the PyTorch reference IN PLACE on
CPU): flagship test.yaml architecture (ResNet-hybrid ViT 256x6 encoder +
AttentionV2 coverage-LSTM decoder), random weights (so both sides decode the
full max_len steps — no early exit), 64x320 grayscale formula images,
max_len 150, beam 5.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec", "vs_baseline": N}
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


BENCH_H, BENCH_W = 64, 320
BENCH_MAX_LEN = 150
BENCH_BEAM = 5
BATCH = 256
N_ITERS = 4
FALLBACK_BASELINE_IPS = 0.9476  # reference CPU beam5 (tools/baseline_measured.json)


def main() -> None:
    global BATCH, N_ITERS, BENCH_MAX_LEN
    if "--quick" in sys.argv:
        BATCH, N_ITERS, BENCH_MAX_LEN = 8, 2, 24
    trace_dir = None
    if "--trace" in sys.argv:  # jax profiler trace of the timed region
        trace_dir = "/tmp/doc2tex_trace"
    import jax

    # persistent compile cache: repeat bench runs skip the 30-200s XLA
    # compiles (safe to share; keyed by program hash)
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from __graft_entry__ import _flagship_config
    from doc2tex_tpu.data.synthetic import synth_sample
    from doc2tex_tpu.decode.runner import make_decode_fn
    from doc2tex_tpu.models import build_model
    from doc2tex_tpu.tokenizer.converters import AttnLabelConverter
    from doc2tex_tpu.train.trainer import init_model, param_count

    cfg = _flagship_config(tiny=False)
    cfg["batch_max_length"] = BENCH_MAX_LEN
    conv = AttnLabelConverter(cfg["character"])
    model = build_model(cfg, conv.num_classes)

    params, batch_stats = init_model(
        model, jax.random.PRNGKey(0), (BATCH, BENCH_H, BENCH_W, 1), BENCH_MAX_LEN + 1
    )
    variables = {"params": params, "batch_stats": batch_stats}
    print(
        f"model: {param_count(params)/1e6:.1f}M params on {jax.devices()[0].platform}",
        file=sys.stderr,
    )

    rng = np.random.default_rng(0)
    batch = np.full((BATCH, BENCH_H, BENCH_W, 1), 255, np.uint8)
    for i in range(BATCH):
        img, _ = synth_sample(rng)
        h, w = min(img.shape[0], BENCH_H), min(img.shape[1], BENCH_W)
        batch[i, :h, :w, 0] = img[:h, :w]
    batch = jax.device_put(batch)

    import jax.numpy as jnp

    decode = make_decode_fn(
        model, cfg, beam_size=BENCH_BEAM, max_steps=BENCH_MAX_LEN + 1
    )

    def run_once(images):
        """One synced decode: scalar readback forces true completion (the
        device tunnel's block_until_ready is unreliable)."""
        tokens, _ = decode(variables, images)
        return int(tokens[0, 0]) + int(tokens[-1, -1])

    t0 = time.perf_counter()
    run_once(batch)
    compile_s = time.perf_counter() - t0
    print(f"compile+first run: {compile_s:.1f}s", file=sys.stderr)

    # host round-trip latency on a trivial synced op (subtracted below)
    tiny = jax.jit(lambda x: jnp.sum(x[:1, :1, :1]))
    _ = int(tiny(batch))
    t0 = time.perf_counter()
    for _ in range(5):
        _ = int(tiny(batch))
    rtt = (time.perf_counter() - t0) / 5
    print(f"host round-trip: {rtt*1000:.0f}ms", file=sys.stderr)

    from doc2tex_tpu.utils.profiling import trace

    times = []
    with trace(trace_dir):
        for _ in range(N_ITERS):
            t0 = time.perf_counter()
            run_once(batch)
            # two scalar readbacks in run_once ~= 2 RTTs of overhead
            times.append(max(time.perf_counter() - t0 - 2 * rtt, 1e-6))
    if trace_dir:
        print(f"profiler trace written to {trace_dir}", file=sys.stderr)
    dt = min(times)  # min = least tunnel noise
    ips = BATCH / dt
    print(f"{dt*1000:.1f} ms/batch of {BATCH}", file=sys.stderr)

    baseline = FALLBACK_BASELINE_IPS
    path = os.path.join(os.path.dirname(__file__), "tools", "baseline_measured.json")
    if os.path.exists(path):
        with open(path) as f:
            baseline = json.load(f)["results"][f"beam{BENCH_BEAM}"]["images_per_sec"]

    print(
        json.dumps(
            {
                "metric": "IM2LATEX-synth images/sec/chip, beam=5, 64x320, max_len=150",
                "value": round(ips, 3),
                "unit": "images/sec",
                "vs_baseline": round(ips / baseline, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
