"""Accuracy cost of the int8 inference path on REAL trained weights.

Loads the shipped demo recognizer (`saved_models/math_recog/synthetic/`,
trained to held-out beam-5 EM 0.725 on the hard synthetic benchmark) and
runs the exact soak eval (same generator/seed/metrics) twice: the normal
bf16 trace and an `ops/quant.py quantized_inference()` trace.  The EM/BLEU
delta between the two rows is the accuracy price of int8 on a real model —
quoted in BASELINE.md next to the int8 throughput rows.

Also serves as the weight-release validation tool (run without --int8 to
reproduce the shipped EM through load_pretrained_variables -> beam decode).

Run (real TPU, idle):  python tools/int8_accuracy_eval.py [--n_eval 160]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

from structured_soak import build


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_eval", type=int, default=256,
                    help="held-out samples generated (the soak default; "
                    "batch trimming keeps 160 of them — the curve's EMs "
                    "are fractions of 160)")
    ap.add_argument(
        "--weights",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "saved_models", "math_recog", "synthetic", "best_weights.msgpack",
        ),
    )
    ap.add_argument("--modes", default="bf16,int8",
                    help="comma list of bf16/int8/int8_full/int8_kv passes "
                    "(int8_full = encoder + int8 decode attention memory; "
                    "int8_kv additionally stores the TFM self-attn caches "
                    "int8)")
    ap.add_argument("--family", default="attn", choices=["attn", "tfm"],
                    help="decoder family / released version to validate: "
                    "attn = synthetic (coverage-LSTM), tfm = synthetic_tfm "
                    "(Transformer head)")
    ap.add_argument("--big", action="store_true",
                    help="flagship-scale arm (structured_soak --big): "
                    "validates the synthetic_tfm_big released weights")
    args = ap.parse_args()
    if args.family == "tfm" and "synthetic/best" in args.weights:
        args.weights = args.weights.replace(
            "synthetic/best",
            "synthetic_tfm_big/best" if args.big else "synthetic_tfm/best",
        )

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

    cfg = build(100000, hard=True, family=args.family, big=args.big)
    kw = {"min_len": 8, "max_len": 150, "max_h": 220, "max_w": 696,
          "scale_range": (3, 5)}  # the soak's calibrated operating point
    ev_images, ev_labels = synth_hard_dataset(args.n_eval, seed=32, **kw)
    conv_cls = TFMLabelConverter if args.family == "tfm" else AttnLabelConverter
    conv = conv_cls(hard_vocab())
    model = build_model(cfg, conv.num_classes)

    params0, stats0 = init_model(
        model, jax.random.PRNGKey(0), (2, 64, 64, 1), cfg["batch_max_length"] + 1
    )
    params, stats, info = load_pretrained_variables(args.weights, params0, stats0)
    print(f"loaded {args.weights}: {info}", file=sys.stderr)

    class S:  # the minimal state `validation` consumes
        pass

    s = S()
    s.params = params
    s.batch_stats = stats
    eval_loader = BucketLoader(
        ArrayDataset(ev_images, ev_labels), conv, cfg, train=False, prefetch=0
    )

    rows = {}
    for mode in args.modes.split(","):
        if mode == "int8":
            ctx = quantized_inference()
        elif mode == "int8_full":
            ctx = quantized_inference(parts=("encoder", "decoder_mem"))
        elif mode == "int8_kv":
            # TFM only: + int8 growing self-attn caches (decoder_kv —
            # accuracy check for the measured-loss perf knob)
            ctx = quantized_inference(
                parts=("encoder", "decoder_mem", "decoder_kv")
            )
        else:
            ctx = None
        if ctx:
            ctx.__enter__()
        try:
            # fresh decode_fn per mode: the quant context is trace-time
            decode_fn = make_decode_fn(model, cfg, beam_size=5)
            t0 = time.time()
            res = validation(model, s, conv, eval_loader, cfg, beam_size=5,
                             decode_fn=decode_fn)
            rows[mode] = {
                "em": round(res["accuracy"], 4), "bleu": round(res["bleu"], 4),
                "char": round(res["ED"], 4), "word": round(res["word_ED"], 4),
                "eval_s": round(time.time() - t0, 1),
            }
        finally:
            if ctx:
                ctx.__exit__(None, None, None)
        print(f"{mode}: {rows[mode]}", flush=True)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
