"""Accuracy gate for serving bucket coalescing (VERDICT r4 item #1).

Coalescing pads a crop up to a CONTAINING bucket (white, top-left — the
train-time ``pad_to_bucket``) so sparse per-bucket queues merge into one
decode invocation.  A tiny formula in a mostly-white big bucket is
off-distribution (training only ever pads a crop up to its own smallest
containing ladder rung), so the ratio knob ships ONLY at a value proven
EM-neutral here on real released weights.

For each area ratio the tool decodes the same held-out hard crops in
server-like mixed chunks with coalescing off (the round-3 shape-pure
behavior) and on, and reports: EM vs labels in both modes, the fraction of
crops whose prediction changed at all, and the measured decode-invocation
count per chunk (the throughput lever this buys).

Run (real TPU, idle):
    python tools/coalesce_eval.py --version synthetic_tfm_big [--n 512]
        [--ratios 4,8,16]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVAL_SEED = 34  # never used by training (31), curves (32), release eval (33)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--version", default="synthetic_tfm_big")
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--ratios", default="4,8,16")
    ap.add_argument("--chunk", type=int, default=64,
                    help="crops per recognizer call (the server dispatch "
                    "batch size)")
    ap.add_argument("--beam", type=int, default=None,
                    help="override the version block's beam (demo contract "
                    "is 10)")
    ap.add_argument("--weights", default=None,
                    help="override the version block's weights file (gate "
                    "a fine-tuned checkpoint before shipping)")
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import numpy as np

    from doc2tex_tpu.data.synthetic import synth_hard_dataset
    from doc2tex_tpu.recognition.flow import (
        MathRecognition,
        load_recog_config,
        postprocess_prediction,
    )
    from doc2tex_tpu.tokenizer.vocab import load_vocab

    cfg, weights = load_recog_config(version=args.version)
    cfg["character"] = load_vocab(cfg["vocab"])
    kw = {"min_len": 8, "max_len": 150, "max_h": 220, "max_w": 696,
          "scale_range": (3, 5)}
    images, labels = synth_hard_dataset(args.n, seed=EVAL_SEED, **kw)
    gts = [postprocess_prediction(l) for l in labels]

    if args.weights:
        weights = args.weights
    recog = MathRecognition(cfg, weights_path=weights, beam_size=args.beam)
    n_calls = [0]
    real = recog._decode_fn()

    def spy(variables, batch):
        n_calls[0] += 1
        return real(variables, batch)

    recog._decode_cache[recog.beam_size] = spy
    chunks = [
        images[i : i + args.chunk] for i in range(0, len(images), args.chunk)
    ]

    def run(ratio):
        recog.coalesce_ratio = float(ratio)
        n_calls[0] = 0
        preds = []
        t0 = time.time()
        for ch in chunks:
            preds.extend(recog(list(ch)))
        wall = time.time() - t0
        em = sum(p == g for p, g in zip(preds, gts)) / len(gts)
        return preds, {
            "em": round(em, 4),
            "invocations": n_calls[0],
            "wall_s": round(wall, 1),
        }

    # warmup pass compiles every (bucket, batch) shape the off-mode needs;
    # timing is still tunnel-noisy — the EM/identity columns are the gate,
    # serve --selftest / page_bench --serve are the throughput record
    run(0.0)
    base_preds, base_row = run(0.0)
    rows = {"off": dict(base_row, identity=1.0)}
    print(f"off: {rows['off']}", flush=True)
    for r in args.ratios.split(","):
        preds, row = run(float(r))
        row["identity"] = round(
            sum(p == b for p, b in zip(preds, base_preds)) / len(preds), 4
        )
        rows[f"ratio_{r}"] = row
        print(f"ratio {r}: {row}", flush=True)

    out = {"version": args.version, "n": len(gts), "beam": recog.beam_size,
           "quantize": cfg.get("quantize"), "chunk": args.chunk,
           "seed": EVAL_SEED, "rows": rows}
    out["weights_override"] = args.weights
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "coalesce_eval_r05.json")
    merged = {}
    if os.path.exists(path):
        with open(path) as f:
            merged = json.load(f)
    merged[args.version + ("_ft" if args.weights else "")] = out
    with open(path, "w") as f:
        json.dump(merged, f, indent=1, sort_keys=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
