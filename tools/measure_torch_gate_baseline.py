"""Measure the PyTorch-CPU reference on the GATE workload (in place).

Companion to measure_torch_baseline.py: same reference model
(config/test.yaml flagship), but at the eval-gate operating point —
batch_max_length 500, beam 5, the 8-bucket 448x960-ladder size mix that
``bench.py --gate`` runs.  The reference decodes batch-1 (its beam asserts
batch==1), so per-bucket cost is one image's decode time; the aggregate is
images/sec over the same mix.

Writes tools/gate_baseline_measured.json consumed by bench.py --gate.
"""

from __future__ import annotations

import json
import os
import sys
import time

REFERENCE = os.environ.get("DOC2TEX_REFERENCE", "/root/reference")
OUT = os.path.join(os.path.dirname(__file__), "gate_baseline_measured.json")

GATE_MAX_LEN = 500
GATE_BEAM = 5
# keep in sync with bench.py GATE_MIX (h, w, n_images)
GATE_MIX = [
    (32, 128, 96), (32, 192, 96), (64, 256, 96), (64, 320, 64),
    (96, 384, 64), (128, 512, 48), (224, 704, 32), (448, 960, 16),
]


def main() -> None:
    sys.path.insert(0, REFERENCE)
    import numpy as np
    import torch

    from doc2tex.modules.build_model import Model
    from doc2tex.modules.converter.attn_converter import AttnLabelConverter

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from doc2tex_tpu.data.synthetic import SYNTH_VOCAB, synth_sample

    torch.set_num_threads(os.cpu_count() or 8)
    device = torch.device("cpu")
    converter = AttnLabelConverter(SYNTH_VOCAB, device)

    config = {
        "imgH": None, "imgW": None,
        "max_dimension": [448, 960], "min_dimension": [32, 32],
        "batch_max_length": GATE_MAX_LEN, "rgb": False, "pad": False,
        "FeatureExtraction": {"name": "None"},
        "SequenceModeling": {"name": "ViT", "params": {
            "backbone": {"name": "resnet", "input_channel": 1,
                         "output_channel": 512, "gcb": False},
            "fix_embed": True, "input_channel": 1, "patching_style": "2d",
            "patch_size": [2, 2], "depth": 6, "num_heads": 8,
            "hidden_size": 256}},
        "Prediction": {"name": "Attnv2", "params": {
            "seqmodel": "TFM", "input_size": 256, "hidden_size": 256,
            "kernel_size": 2, "kernel_dim": 128, "embed_target": True,
            "enc_init": True, "attn_type": "coverage", "method": "concat",
            "teacher_forcing": 1.0, "droprate": 0.2}},
        "beam_size": GATE_BEAM,
        "num_class": len(converter.character),
        "device": device,
    }
    model = Model(config).to(device).eval()
    text_for_pred = torch.zeros((1, GATE_MAX_LEN + 2), dtype=torch.long,
                                device=device)

    rng = np.random.default_rng(0)
    rows = []
    total_images = 0
    total_time = 0.0
    with torch.no_grad():
        for h, w, n in GATE_MIX:
            arr = np.full((h, w), 255, np.uint8)
            img, _ = synth_sample(rng)
            hh, ww = min(img.shape[0], h), min(img.shape[1], w)
            arr[:hh, :ww] = img[:hh, :ww]
            x = torch.from_numpy(
                (arr.astype(np.float32) / 255.0 - 0.5) / 0.5
            )[None, None]
            # one untimed pass (allocator warmup), one timed
            model(x, text_for_pred, is_train=False, is_test=True)
            t0 = time.perf_counter()
            model(x, text_for_pred, is_train=False, is_test=True)
            dt = time.perf_counter() - t0
            rows.append({"bucket": f"{h}x{w}", "s_per_image": round(dt, 2),
                         "n": n})
            total_images += n
            total_time += dt * n
            print(f"bucket {h}x{w}: {dt:.2f} s/image (beam {GATE_BEAM}, "
                  f"max_len {GATE_MAX_LEN})", flush=True)

    agg = total_images / total_time
    out = {
        "workload": "gate (test.yaml 448x960 ladder, beam 5, max_len 500)",
        "threads": torch.get_num_threads(),
        "per_bucket": rows,
        "images_per_sec": round(agg, 4),
    }
    with open(OUT, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
