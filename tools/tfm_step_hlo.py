"""Dump optimized-HLO stats for the TFM decode step loop: find the copies.

Compiles the 150-step fori_loop of decode_step for the real TPU (no run),
prints memory analysis and every `copy`/`transpose` instruction touching a
cache-sized buffer.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_config
    from doc2tex_tpu.models import build_model
    from doc2tex_tpu.tokenizer.converters import TFMLabelConverter
    from doc2tex_tpu.train.trainer import init_model

    B, K, T = 256, 5, 150
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
        model, jax.random.PRNGKey(0), (4, 64, 320, 1), T + 1
    )
    variables = {"params": params, "batch_stats": batch_stats}

    enc = jnp.zeros((B, 83, 256), jnp.float32)
    toks = jnp.ones((B * K,), jnp.int32)

    @jax.jit
    def step_loop(v, e):
        s = model.apply(v, e, T, K, method="init_decode_state")

        def body(_, s):
            s, logits = model.apply(v, s, toks, method="decode_step")
            return s

        s = jax.lax.fori_loop(0, T, body, s)
        return s.k_cache[0][0, 0, 0].sum()

    lowered = step_loop.lower(variables, enc)
    compiled = lowered.compile()
    ma = compiled.memory_analysis()
    print("memory:", ma)
    hlo = compiled.as_text()
    big = 0
    for line in hlo.splitlines():
        ls = line.strip()
        if ("= bf16[" in ls or "= f32[" in ls) and (
            " copy(" in ls or " transpose(" in ls
        ):
            # report only big ones (>10 MB)
            shape = re.search(r"= (bf16|f32)\[([\d,]+)\]", ls)
            if shape:
                dims = [int(d) for d in shape.group(2).split(",")]
                n = 1
                for d in dims:
                    n *= d
                bytes_ = n * (2 if shape.group(1) == "bf16" else 4)
                if bytes_ > 10 * 1024 * 1024:
                    big += 1
                    print(f"[{bytes_/1e6:8.1f} MB] {ls[:180]}")
    print("big copies/transposes:", big)


if __name__ == "__main__":
    main()
