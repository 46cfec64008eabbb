"""Measure the PyTorch-CPU reference baseline (runs the reference IN PLACE).

The reference repo publishes no benchmark numbers (BASELINE.md), so this
script produces them: it imports the reference from /root/reference (never
copying code), builds the ``config/test.yaml`` flagship (ResNet-hybrid ViT
encoder + AttentionV2 coverage decoder, reference
``doc2tex/modules/build_model.py``), and times greedy and beam=5 decode on
synthetic formula images at inference sizes.  Random weights: with an
untrained model neither side early-exits, so both frameworks do the full
``max_len`` decode steps — an apples-to-apples per-image cost.

Writes tools/baseline_measured.json consumed by bench.py's vs_baseline.
"""

from __future__ import annotations

import json
import os
import sys
import time

REFERENCE = os.environ.get("DOC2TEX_REFERENCE", "/root/reference")
OUT = os.path.join(os.path.dirname(__file__), "baseline_measured.json")

# bench workload contract (keep in sync with bench.py)
BENCH_H, BENCH_W = 64, 320
BENCH_MAX_LEN = 150
BENCH_BEAM = 5
N_IMAGES = 4
N_WARMUP = 1


def main() -> None:
    # --tfm: the reference's second decoder family (TransformerPrediction,
    # doc2tex/modules/component/prediction_head/tfm.py:36-195) at the same
    # flagship encoder — the denominator for bench.py --tfm's vs_baseline.
    tfm = "--tfm" in sys.argv
    sys.path.insert(0, REFERENCE)
    import torch

    from doc2tex.modules.build_model import Model
    from doc2tex.modules.converter.attn_converter import AttnLabelConverter
    from doc2tex.modules.converter.tfm_converter import TFMLabelConverter

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from doc2tex_tpu.data.synthetic import SYNTH_VOCAB, synth_sample

    torch.set_num_threads(os.cpu_count() or 8)
    device = torch.device("cpu")
    conv_cls = TFMLabelConverter if tfm else AttnLabelConverter
    converter = conv_cls(SYNTH_VOCAB, device)

    config = {
        "imgH": None,
        "imgW": None,
        "max_dimension": [448, 960],
        "min_dimension": [32, 32],
        "batch_max_length": BENCH_MAX_LEN,
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
        "Prediction": (
            {
                # mirror bench.py --tfm (flagship-scale TFM head)
                "name": "TFM",
                "params": {
                    "d_model": 256,
                    "nhead": 8,
                    "num_decoder_layers": 3,
                    "dim_feedforward": 1024,
                    "dropout": 0.1,
                    "max_seq_len": BENCH_MAX_LEN + 2,
                    "padding_idx": 0,
                },
            }
            if tfm
            else {
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
            }
        ),
        "num_class": len(converter.character),
        "device": device,
        "beam_size": BENCH_BEAM,
    }

    model = Model(config).to(device).eval()
    n_params = sum(p.numel() for p in model.parameters())
    print(f"reference model: {n_params/1e6:.1f}M params", file=sys.stderr)

    import numpy as np

    rng = np.random.default_rng(0)
    images = []
    for _ in range(N_IMAGES + N_WARMUP):
        img, _ = synth_sample(rng)
        # normalized (1, 1, H, W) at the bench shape
        arr = np.full((BENCH_H, BENCH_W), 255, np.uint8)
        h = min(img.shape[0], BENCH_H)
        w = min(img.shape[1], BENCH_W)
        arr[:h, :w] = img[:h, :w]
        x = (arr.astype(np.float32) / 255.0 - 0.5) / 0.5
        images.append(torch.from_numpy(x[None, None]))

    if tfm:
        # reference TFM eval contract: (batch, 1) filled with [GO]
        # (api/infer.py:149-153); greedy appends to this prefix
        text_for_pred = torch.full(
            (1, 1), converter.dict["[GO]"], dtype=torch.long, device=device
        )
    else:
        text_for_pred = torch.zeros(
            (1, BENCH_MAX_LEN + 2), dtype=torch.long, device=device
        )

    results = {}
    for mode, beam in (("greedy", 1), (f"beam{BENCH_BEAM}", BENCH_BEAM)):
        config["beam_size"] = beam
        with torch.no_grad():
            for img in images[:N_WARMUP]:
                model(img, text_for_pred, is_train=False, is_test=True)
            t0 = time.perf_counter()
            for img in images[N_WARMUP:]:
                model(img, text_for_pred, is_train=False, is_test=True)
            dt = time.perf_counter() - t0
        ips = N_IMAGES / dt
        results[mode] = {"images_per_sec": ips, "sec_per_image": dt / N_IMAGES}
        print(f"reference CPU {mode}: {ips:.3f} img/s", file=sys.stderr)

    payload = {
        "workload": {
            "image_hw": [BENCH_H, BENCH_W],
            "max_len": BENCH_MAX_LEN,
            "beam": BENCH_BEAM,
            "model": (
                "hybrid-vit-256x6 + TFM decoder (256/8h/3L/ffn1024)"
                if tfm
                else "hybrid-vit-256x6 + Attnv2 coverage (test.yaml arch)"
            ),
            "weights": "random (full-length decode both sides)",
            "hardware": f"cpu x{os.cpu_count()} threads",
        },
        "results": results,
    }
    out = OUT.replace(".json", "_tfm.json") if tfm else OUT
    with open(out, "w") as f:
        json.dump(payload, f, indent=2)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
