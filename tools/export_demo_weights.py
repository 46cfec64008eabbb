"""Export a trained soak checkpoint as shippable demo recognizer weights.

Takes a full TrainState checkpoint (e.g. /tmp/hard_soak/last.msgpack from
tools/structured_soak.py --hard), drops the optimizer state, optionally
downcasts params for size, and writes a weights-only msgpack that
``load_pretrained_variables`` (and therefore ``MathRecognition`` /
``api/infer.py --saved_model``) can restore — params + BN running stats.

The reference publishes released weight files per demo model version
(``demo/recog_cfg.yaml`` ``weight_path``); it ships none in-repo.  This
tool closes that gap for the `synthetic` model version: weights trained
on the hard synthetic benchmark (KaTeX-inventory vocab, render noise,
multi-font glyphs) so the demo pipeline runs a REAL recognizer out of
the box.

Export from the soak's BEST-EM checkpoint (kept separately since d894f66
because held-out EM oscillates a few points late in training), not the
last one:

Run: python tools/export_demo_weights.py \
       --ckpt /tmp/hard_soak/best.msgpack \
       --out saved_models/math_recog/synthetic/best_weights.msgpack
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from flax import serialization


def export(ckpt: str, out: str, dtype: str = "float16") -> dict:
    with open(ckpt, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    cast = np.dtype(dtype)

    def _cast(x):
        x = np.asarray(x)
        # float params downcast for size; ints (e.g. step) stay
        return x.astype(cast) if x.dtype == np.float32 else x

    import jax

    slim = {
        "step": np.asarray(payload.get("step", 0)),
        "params": jax.tree_util.tree_map(_cast, payload["params"]),
        # BN running stats stay f32 — they are cheap and precision-critical
        "batch_stats": payload.get("batch_stats", {}),
    }
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with open(out, "wb") as f:
        f.write(serialization.msgpack_serialize(
            serialization.to_state_dict(slim)))
    meta = {}
    if os.path.exists(ckpt + ".json"):
        with open(ckpt + ".json") as f:
            meta = json.load(f)
    n_params = sum(
        int(np.asarray(x).size)
        for x in jax.tree_util.tree_leaves(payload["params"])
    )
    info = {
        "source": ckpt,
        "source_meta": meta,
        "params": n_params,
        "dtype": dtype,
        "bytes": os.path.getsize(out),
    }
    with open(out + ".json", "w") as f:
        json.dump(info, f, indent=2, default=float)
    return info


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="/tmp/hard_soak/best.msgpack")
    ap.add_argument(
        "--out",
        default="saved_models/math_recog/synthetic/best_weights.msgpack",
    )
    ap.add_argument("--dtype", default="float16",
                    choices=["float16", "float32"])
    args = ap.parse_args()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = args.out if os.path.isabs(args.out) else os.path.join(root, args.out)
    info = export(args.ckpt, out, args.dtype)
    print(json.dumps(info, indent=2, default=float))


if __name__ == "__main__":
    main()
