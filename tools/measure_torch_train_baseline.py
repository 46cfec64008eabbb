"""Measure the PyTorch-CPU reference TRAIN-step baseline (in place).

Counterpart of tools/measure_torch_baseline.py for training: BASELINE.md
had decode-side ratios only.  Builds the reference flagship
(config/test.yaml arch: ResNet-hybrid ViT 256x6 + Attnv2 coverage head,
reference ``doc2tex/modules/build_model.py``) and times the reference's
train step — teacher-forced forward (``engine/training.py:76-90``:
``model(image, text[:, :-1])`` -> CE over ``text[:, 1:]``), backward, and
AdamW update (``engine/training.py:94-148``) — on CPU at the same bucket
shape as tools/train_bench.py (batch x 128 x 512, max_len 150).

Random weights + random targets: throughput only, no early exit on either
side.  Writes tools/train_baseline_measured.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

REFERENCE = os.environ.get("DOC2TEX_REFERENCE", "/root/reference")
OUT = os.path.join(os.path.dirname(__file__), "train_baseline_measured.json")

BUCKET_H, BUCKET_W = 128, 512
MAX_LEN = 150
BATCH = int(os.environ.get("TRAIN_BASE_BATCH", "16"))  # reference train.yaml batch
N_WARMUP = 1
N_STEPS = int(os.environ.get("TRAIN_BASE_STEPS", "3"))


def main() -> None:
    sys.path.insert(0, REFERENCE)
    import torch

    from doc2tex.modules.build_model import Model
    from doc2tex.modules.converter.attn_converter import AttnLabelConverter

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from doc2tex_tpu.data.synthetic import SYNTH_VOCAB

    torch.set_num_threads(os.cpu_count() or 8)
    device = torch.device("cpu")
    converter = AttnLabelConverter(SYNTH_VOCAB, device)

    config = {
        "imgH": None,
        "imgW": None,
        "max_dimension": [448, 960],
        "min_dimension": [32, 32],
        "batch_max_length": MAX_LEN,
        "rgb": False,
        "pad": False,
        "FeatureExtraction": {"name": "None"},
        "SequenceModeling": {
            "name": "ViT",
            "params": {
                "backbone": {
                    "name": "resnet",
                    "input_channel": 1,
                    "output_channel": 512,
                    "gcb": False,
                },
                "fix_embed": True,
                "input_channel": 1,
                "patching_style": "2d",
                "patch_size": [2, 2],
                "depth": 6,
                "num_heads": 8,
                "hidden_size": 256,
            },
        },
        "Prediction": {
            "name": "Attnv2",
            "params": {
                "seqmodel": "TFM",
                "input_size": 256,
                "hidden_size": 256,
                "kernel_size": 2,
                "kernel_dim": 128,
                "embed_target": True,
                "enc_init": True,
                "attn_type": "coverage",
                "method": "concat",
                "teacher_forcing": 1.0,
                "droprate": 0.2,
            },
        },
        "num_class": len(converter.character),
        "device": device,
        "beam_size": 1,
    }

    model = Model(config).to(device).train()
    n_params = sum(p.numel() for p in model.parameters())
    print(f"reference model: {n_params/1e6:.1f}M params", file=sys.stderr)

    criterion = torch.nn.CrossEntropyLoss(ignore_index=0)  # GO=pad=0
    optim = torch.optim.AdamW(model.parameters(), lr=5e-4, weight_decay=2e-6)

    import numpy as np

    rng = np.random.default_rng(0)
    image = torch.from_numpy(
        ((rng.integers(0, 255, (BATCH, 1, BUCKET_H, BUCKET_W)) / 255.0 - 0.5)
         / 0.5).astype(np.float32)
    )
    # (B, L+2) teacher-forcing layout: GO at col 0, random body, pad tail
    text = torch.zeros((BATCH, MAX_LEN + 2), dtype=torch.long)
    body = rng.integers(2, len(converter.character), (BATCH, MAX_LEN))
    text[:, 1 : MAX_LEN + 1] = torch.from_numpy(body)

    def one_step() -> float:
        optim.zero_grad(set_to_none=True)
        _, preds, _ = model(image, text[:, :-1], is_train=True)
        target = text[:, 1:]
        cost = criterion(
            preds.reshape(-1, preds.shape[-1]), target.reshape(-1)
        )
        cost.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 5.0)
        optim.step()
        return float(cost)

    for _ in range(N_WARMUP):
        one_step()
    t0 = time.perf_counter()
    for _ in range(N_STEPS):
        one_step()
    dt = (time.perf_counter() - t0) / N_STEPS

    payload = {
        "workload": {
            "bucket_hw": [BUCKET_H, BUCKET_W],
            "batch": BATCH,
            "max_len": MAX_LEN,
            "model": "hybrid-vit-256x6 + Attnv2 coverage (test.yaml arch)",
            "step": "teacher-forced fwd + bwd + clip + AdamW",
            "weights": "random",
            "hardware": f"cpu x{os.cpu_count()} threads",
        },
        "results": {
            "sec_per_step": dt,
            "images_per_sec": BATCH / dt,
        },
    }
    with open(OUT, "w") as f:
        json.dump(payload, f, indent=2)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
