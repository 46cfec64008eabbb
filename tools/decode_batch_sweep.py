"""Decode throughput vs batch size on the small gate buckets.

The gate bench showed the 32-high buckets are decode-dominated (tiny
encoder, ~70-120us per autoregressive step mostly loop overhead).  The
lever is batch: more formulas per decode amortizes the per-step fixed
cost.  This sweeps batch sizes at the two smallest gate shapes and prints
img/s so the gate mix batching can be retuned with data.

Run (real TPU): python tools/decode_batch_sweep.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from doc2tex_tpu.config import load_config
    from doc2tex_tpu.data.synthetic import SYNTH_VOCAB, synth_sample
    from doc2tex_tpu.decode.runner import make_decode_fn
    from doc2tex_tpu.models import build_model
    from doc2tex_tpu.tokenizer.converters import AttnLabelConverter
    from doc2tex_tpu.train.trainer import init_model

    cfg = load_config(
        os.path.join(os.path.dirname(__file__), "..", "config", "test.yaml")
    )
    cfg["character"] = list(SYNTH_VOCAB)
    cfg["vocab"] = ""
    cfg["saved_model"] = ""
    cfg["batch_max_length"] = 500
    conv = AttnLabelConverter(cfg["character"])
    cfg["num_class"] = conv.num_classes
    model = build_model(cfg, conv.num_classes)
    params, batch_stats = init_model(
        model, jax.random.PRNGKey(0), (2, 64, 320, 1), 501
    )
    variables = {"params": params, "batch_stats": batch_stats}
    decode = make_decode_fn(model, cfg, beam_size=5, max_steps=501)

    rng = np.random.default_rng(0)
    for h, w in [(32, 128), (32, 192), (64, 320)]:
        for bs in [96, 192, 384, 768]:
            batch = np.full((bs, h, w, 1), 255, np.uint8)
            for i in range(bs):
                img, _ = synth_sample(rng)
                hh, ww = min(img.shape[0], h), min(img.shape[1], w)
                batch[i, :hh, :ww, 0] = img[:hh, :ww]
            bd = jax.device_put(batch)
            tokens, _ = decode(variables, bd)
            _ = int(tokens[0, 0])  # compile + sync
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                tokens, _ = decode(variables, bd)
                _ = int(tokens[0, 0])
                best = min(best, time.perf_counter() - t0 - 0.025)
            print(
                f"{h}x{w} b={bs}: {best*1e3:.1f} ms  {bs/best:.0f} img/s",
                flush=True,
            )


if __name__ == "__main__":
    main()
