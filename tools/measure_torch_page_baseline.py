"""Measure the PyTorch-CPU reference on the FULL-PAGE pipeline (in place).

Counterpart of tools/page_bench.py (BASELINE.json gate config #5): the
reference demo flow — sliding-window ScanSSD detection (``demo/app.py:
118-168``: get_rolling_crops stride 128, DetectAny batches of 32,
postprocess + torchvision nms) followed by per-crop HybridViT beam-10
recognition (the reference beam asserts batch==1, so crops decode one at
a time) — on the same synthetic GTDB-style pages, random weights on both
sides (see page_bench.py workload notes; recognition runs on the gt crops
on both sides).

Writes tools/page_baseline_measured.json consumed by page_bench.py.

Run: python tools/measure_torch_page_baseline.py [--pages 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REFERENCE = os.environ.get("DOC2TEX_REFERENCE", "/root/reference")
OUT = os.path.join(os.path.dirname(__file__), "page_baseline_measured.json")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=2)
    ap.add_argument("--beam", type=int, default=10)
    ap.add_argument("--max_len", type=int, default=200)
    args_cli = ap.parse_args()

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import numpy as np

    from doc2tex_tpu.data.synthetic import hard_vocab
    from tools.page_bench import synth_gtdb_page

    rng = np.random.default_rng(0)
    pages = [synth_gtdb_page(rng) for _ in range(args_cli.pages)]

    sys.path.insert(0, os.path.join(REFERENCE, "demo", "ScanSSD"))
    sys.path.insert(0, os.path.join(REFERENCE, "demo"))
    sys.path.insert(0, REFERENCE)
    import torch

    torch.set_num_threads(os.cpu_count() or 8)

    # torchvision is absent in this container (the reference demo itself
    # cannot import here); stub the two pieces ScanSSD touches — an empty
    # ``transforms`` (only imported, never used on this path) and a
    # faithful ``ops.nms`` (sort by score, suppress IoU > thresh)
    import types

    def _nms(boxes: "torch.Tensor", scores: "torch.Tensor", iou: float):
        order = scores.argsort(descending=True)
        keep = []
        while order.numel() > 0:
            i = order[0]
            keep.append(i.item())
            if order.numel() == 1:
                break
            rest = boxes[order[1:]]
            b = boxes[i]
            x1 = torch.maximum(rest[:, 0], b[0])
            y1 = torch.maximum(rest[:, 1], b[1])
            x2 = torch.minimum(rest[:, 2], b[2])
            y2 = torch.minimum(rest[:, 3], b[3])
            inter = (x2 - x1).clamp(min=0) * (y2 - y1).clamp(min=0)
            area_b = (b[2] - b[0]).clamp(min=0) * (b[3] - b[1]).clamp(min=0)
            area_r = (rest[:, 2] - rest[:, 0]).clamp(min=0) * (
                rest[:, 3] - rest[:, 1]
            ).clamp(min=0)
            iou_v = inter / (area_b + area_r - inter + 1e-12)
            order = order[1:][iou_v <= iou]
        return torch.tensor(keep, dtype=torch.long)

    tv = types.ModuleType("torchvision")
    tv.transforms = types.ModuleType("torchvision.transforms")
    tv_ops = types.ModuleType("torchvision.ops")
    tv_ops.nms = _nms
    tv.ops = tv_ops
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.transforms", tv.transforms)
    sys.modules.setdefault("torchvision.ops", tv_ops)

    # ---- detection: the demo's ScanSSD setup with random weights
    from ScanSSD import detect_flow
    from ScanSSD.data import config as ssd_config
    from ScanSSD.ssd import build_ssd

    # demo/utils is shadowed by ScanSSD/utils on sys.path: load by file
    import importlib.util

    _spec = importlib.util.spec_from_file_location(
        "p2l_utils", os.path.join(REFERENCE, "demo", "utils", "p2l_utils.py")
    )
    _p2l = importlib.util.module_from_spec(_spec)
    _spec.loader.exec_module(_p2l)
    get_rolling_crops, postprocess = _p2l.get_rolling_crops, _p2l.postprocess

    class DetectCfg:  # mirrors reference demo/app.py:23-41
        cuda = False
        kernel = (1, 5)
        padding = (0, 2)
        phase = "test"
        visual_threshold = 0.8
        verbose = False
        exp_name = "SSD"
        model_type = 512
        use_char_info = False
        limit = -1
        cfg = "hboxes512"
        batch_size = 32
        num_workers = 4
        neg_mining = True
        log_dir = "logs"
        stride = 0.1
        window = 1200

    cfg_obj = DetectCfg()
    net = build_ssd(
        cfg_obj, "test", ssd_config.exp_cfg[cfg_obj.cfg], 0,
        cfg_obj.model_type, num_classes=2,
    ).eval()
    det = detect_flow.MathDetector.__new__(detect_flow.MathDetector)
    det._args = cfg_obj
    det._net = net

    nms = _nms

    @torch.inference_mode()
    def detect_page(page_gray: np.ndarray):
        # reference math_detection (demo/app.py:118-151)
        img = np.repeat(page_gray[..., None], 3, axis=-1)
        crops_list, padded_crops_list, crops_info_list = get_rolling_crops(
            img, stride=[128, 128]
        )
        scores_list, wb_list = [], []
        for i in range(0, len(padded_crops_list), 32):
            batch = padded_crops_list[i : i + 32]
            window_borders, scores = det.DetectAny(batch, 0.9)
            scores_list.extend(scores)
            wb_list.extend(window_borders)
        bb_list, s_list = postprocess(wb_list, scores_list, crops_info_list)
        bb = torch.tensor(bb_list).float()
        if bb.shape[0] == 0:
            return []
        keep = nms(bb, torch.tensor(s_list), 0.1)
        return bb[keep].int().tolist()

    # ---- recognition: flagship HybridViT, beam-10 batch-1 per crop
    from doc2tex.modules.build_model import Model
    from doc2tex.modules.converter.attn_converter import AttnLabelConverter

    device = torch.device("cpu")
    converter = AttnLabelConverter(hard_vocab(), device)
    model_cfg = {
        "imgH": None, "imgW": None,
        "max_dimension": [224, 960], "min_dimension": [32, 32],
        "batch_max_length": args_cli.max_len, "rgb": False, "pad": True,
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
            "teacher_forcing": 1.0, "droprate": 0.25}},
        "beam_size": args_cli.beam,
        "num_class": len(converter.character),
        "device": device,
    }
    model = Model(model_cfg).to(device).eval()
    text_for_pred = torch.zeros(
        (1, args_cli.max_len + 2), dtype=torch.long, device=device
    )

    @torch.no_grad()
    def recognize(crop: np.ndarray):
        x = torch.from_numpy(
            (crop.astype(np.float32) / 255.0 - 0.5) / 0.5
        )[None, None]
        return model(x, text_for_pred, is_train=False, is_test=True)

    det_t = rec_t = 0.0
    n_crops = 0
    for page, boxes in pages:
        t0 = time.perf_counter()
        detected = detect_page(page)
        det_t += time.perf_counter() - t0
        t0 = time.perf_counter()
        for (x1, y1, x2, y2) in boxes:
            recognize(page[y1:y2, x1:x2])
        rec_t += time.perf_counter() - t0
        n_crops += len(boxes)
        print(
            f"page done: {len(detected)} detected, {len(boxes)} gt crops "
            f"(det {det_t:.1f}s rec {rec_t:.1f}s cum)", file=sys.stderr,
        )

    wall = det_t + rec_t
    result = {
        "pages_per_sec": args_cli.pages / wall,
        "pages": args_cli.pages,
        "crops": n_crops,
        "detect_s_per_page": det_t / args_cli.pages,
        "recognize_s_per_page": rec_t / args_cli.pages,
        "beam": args_cli.beam,
        "max_len": args_cli.max_len,
        "num_class": len(converter.character),
        "threads": torch.get_num_threads(),
    }
    with open(OUT, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
