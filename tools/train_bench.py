"""Train-step throughput bench (companion to the decode bench in bench.py).

Measures steady-state images/sec of the fused train step on the flagship
model at a realistic bucket shape.  Prints one JSON line.

Measured (v5e-1, flagship 50M params, bucket 128x512):
  batch 16 -> ~186 img/s, batch 64 -> ~204 img/s (compute-bound).
"""

import json
import sys
import time

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))


def main(batch: int = 64, h: int = 128, w: int = 512, iters: int = 6) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from __graft_entry__ import _flagship_config
    from doc2tex_tpu.models import build_model
    from doc2tex_tpu.tokenizer.converters import AttnLabelConverter
    from doc2tex_tpu.train.trainer import (
        create_train_state, criterion_from_config, make_train_step,
    )

    cfg = _flagship_config(tiny=False)
    cfg.update(batch_max_length=150, augment=True)
    conv = AttnLabelConverter(cfg["character"])
    model = build_model(cfg, conv.num_classes)
    state, tx = create_train_state(model, cfg, jax.random.PRNGKey(0), (batch, h, w, 1))
    step = make_train_step(model, criterion_from_config(cfg), tx, cfg)

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 255, (batch, h, w, 1), dtype=np.uint8))
    text = jnp.asarray(rng.integers(0, conv.num_classes, (batch, 152)).astype(np.int32))
    key = jax.random.PRNGKey(1)

    # XLA cost analysis on the compiled step -> train-step MFU
    # (fwd + bwd + AdamW update flops, vs the v5e bf16 matmul peak — the
    # same denominator bench.py uses for the encoder MFU)
    step_flops = None
    try:
        compiled = step.lower(state, imgs, text, key).compile()
        step_flops = float(compiled.cost_analysis().get("flops", 0.0))
    except Exception:
        pass

    state, m = step(state, imgs, text, key)
    _ = float(m["loss"])  # sync (compile)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, imgs, text, key)
    _ = float(m["loss"])
    dt = (time.perf_counter() - t0) / iters

    v5e_bf16_peak = 197e12
    mfu = (
        round(step_flops / dt / v5e_bf16_peak, 3)
        if step_flops else None
    )

    # reference torch-CPU train step at the same bucket shape
    # (tools/measure_torch_train_baseline.py)
    vs_baseline = None
    base_path = __import__("os").path.join(
        __import__("os").path.dirname(__import__("os").path.abspath(__file__)),
        "train_baseline_measured.json",
    )
    try:
        with open(base_path) as f:
            base = json.load(f)["results"]["images_per_sec"]
        vs_baseline = round(batch / dt / base, 1)
    except Exception:
        pass

    print(json.dumps({
        "metric": f"train images/sec/chip, bucket {h}x{w}, batch {batch}",
        "value": round(batch / dt, 2),
        "unit": "images/sec",
        "ms_per_step": round(dt * 1000, 1),
        "step_tflops": None if step_flops is None
        else round(step_flops / 1e12, 2),
        "mfu_vs_bf16_peak": mfu,
        "vs_baseline": vs_baseline,
    }))


if __name__ == "__main__":
    main()
