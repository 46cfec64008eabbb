"""Release-grade accuracy evaluation: big-n held-out EM with binomial CIs.

The hard-benchmark curves (tools/hard_*.jsonl) ride a ~160-sample eval
set, whose 95% binomial CI at EM ~0.85 is ~±5.4 pts — fine for tracking a
training run, not for publishing release numbers or adjudicating close
A/Bs (VERDICT r3 weak #1).  This tool re-evaluates a released checkpoint
on >=1024 FRESH held-out samples (a generator seed never used for
training or curve evals) in both bf16 and int8 modes, and reports EM with
Wilson 95% intervals plus BLEU/edit metrics.

Published numbers go to BASELINE.md; raw rows to
``tools/release_eval_r04.json`` (merged across invocations).

Run (real TPU, idle), one release per invocation:
    python tools/release_eval.py --family attn              # `synthetic`
    python tools/release_eval.py --family tfm               # `synthetic_tfm`
    python tools/release_eval.py --family tfm --big         # `synthetic_tfm_big`
"""

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

from structured_soak import build

OUT_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "release_eval_r05.json"
)
# fresh held-out seed: train=31, curve evals=32 (structured_soak.py) — 33
# has never been drawn by any training or eval arm
EVAL_SEED = 33


def wilson(k: int, n: int, z: float = 1.96) -> tuple[float, float]:
    """Wilson score 95% interval for a binomial proportion."""
    if n == 0:
        return (0.0, 1.0)
    p = k / n
    denom = 1 + z * z / n
    center = (p + z * z / (2 * n)) / denom
    half = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n)) / denom
    return (round(center - half, 4), round(center + half, 4))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_gen", type=int, default=1536,
                    help="samples generated; bucket trimming to batch-size "
                    "multiples keeps ~2/3 — 1536 keeps >=1024")
    ap.add_argument("--family", default="attn", choices=["attn", "tfm"])
    ap.add_argument("--big", action="store_true")
    ap.add_argument("--long", action="store_true",
                    help="evaluate the synthetic_long release on held-out "
                    "LONG samples (448x960, up to 500 tokens)")
    ap.add_argument("--modes", default="bf16,int8")
    ap.add_argument("--weights", default=None)
    args = ap.parse_args()

    version = (
        "synthetic_long" if args.long
        else "synthetic" if args.family == "attn"
        else "synthetic_tfm_big" if args.big else "synthetic_tfm"
    )
    if args.weights:
        # override runs must not overwrite the shipped release's record
        version += "_w:" + os.path.basename(os.path.dirname(args.weights))
    if args.long:
        args.family, args.big = "tfm", True
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    weights = args.weights or os.path.join(
        root, "saved_models", "math_recog", version, "best_weights.msgpack"
    )

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from doc2tex_tpu.data.loader import ArrayDataset, BucketLoader
    from doc2tex_tpu.data.synthetic import hard_vocab, synth_hard_dataset
    from doc2tex_tpu.decode.runner import make_decode_fn
    from doc2tex_tpu.engine.inferencing import validation
    from doc2tex_tpu.models import build_model
    from doc2tex_tpu.ops.quant import quantized_inference
    from doc2tex_tpu.tokenizer.converters import (
        AttnLabelConverter,
        TFMLabelConverter,
    )
    from doc2tex_tpu.train.checkpoint import load_pretrained_variables
    from doc2tex_tpu.train.trainer import init_model

    cfg = build(100000, hard=True, family=args.family, big=args.big,
                long=args.long)
    t0 = time.time()
    if args.long:
        from doc2tex_tpu.data.synthetic import synth_long_dataset

        ev_images, ev_labels = synth_long_dataset(
            args.n_gen, seed=EVAL_SEED)
    else:
        kw = {"min_len": 8, "max_len": 150, "max_h": 220, "max_w": 696,
              "scale_range": (3, 5)}  # the soak's calibrated operating point
        ev_images, ev_labels = synth_hard_dataset(
            args.n_gen, seed=EVAL_SEED, **kw)
    print(f"generated {args.n_gen} samples in {time.time()-t0:.0f}s",
          file=sys.stderr, flush=True)
    conv_cls = TFMLabelConverter if args.family == "tfm" else AttnLabelConverter
    conv = conv_cls(hard_vocab())
    model = build_model(cfg, conv.num_classes)

    params0, stats0 = init_model(
        model, jax.random.PRNGKey(0), (2, 64, 64, 1),
        cfg["batch_max_length"] + 1,
    )
    params, stats, info = load_pretrained_variables(weights, params0, stats0)
    print(f"loaded {weights}: {info}", file=sys.stderr, flush=True)

    class S:
        pass

    s = S()
    s.params = params
    s.batch_stats = stats
    eval_loader = BucketLoader(
        ArrayDataset(ev_images, ev_labels), conv, cfg, train=False, prefetch=0
    )

    rows = {}
    for mode in args.modes.split(","):
        ctx = quantized_inference() if mode == "int8" else None
        if ctx:
            ctx.__enter__()
        try:
            decode_fn = make_decode_fn(model, cfg, beam_size=5)
            t0 = time.time()
            res = validation(model, s, conv, eval_loader, cfg, beam_size=5,
                             decode_fn=decode_fn)
        finally:
            if ctx:
                ctx.__exit__(None, None, None)
        n = int(res["n_samples"])
        k = round(res["accuracy"] * n)
        lo, hi = wilson(k, n)
        rows[mode] = {
            "version": version, "n": n, "em": round(res["accuracy"], 4),
            "em_ci95": [lo, hi], "bleu": round(res["bleu"], 4),
            "char": round(res["ED"], 4), "word": round(res["word_ED"], 4),
            "eval_s": round(time.time() - t0, 1), "seed": EVAL_SEED,
        }
        print(f"{version} {mode}: {rows[mode]}", flush=True)

    merged = {}
    if os.path.exists(OUT_PATH):
        with open(OUT_PATH) as f:
            merged = json.load(f)
    merged[version] = rows
    with open(OUT_PATH, "w") as f:
        json.dump(merged, f, indent=1, sort_keys=True)
    print(json.dumps({version: rows}))


if __name__ == "__main__":
    main()
