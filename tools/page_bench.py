"""Full-page pipeline throughput (BASELINE.json gate config #5).

Drives the demo pipeline end-to-end on synthetic GTDB-style pages —
sliding-window SSD detection + page-level NMS (or voting stitch), region
cropping, and bucketed batched beam recognition — and reports pages/sec
on the current device with a per-stage breakdown.

Match: reference ``demo/app.py:118-168`` (detect -> expand/crop ->
recognize loop).  The torch-CPU counterpart is
``tools/measure_torch_page_baseline.py`` (same pages, same semantics);
its JSON lands in ``tools/page_baseline_measured.json`` and feeds the
``vs_baseline`` ratio here.

Workload notes (identical on both sides):
  * random weights everywhere — the recognizer decodes to max_len each
    crop (no early exit) and the detector's conv/NMS cost is exercised
    in full;
  * recognition runs on the GROUND-TRUTH region crops, so the measured
    work per page is deterministic (a random-weight detector's box count
    is not); detection QUALITY is scored separately
    (tools/detection_soak.py: CROHME coarse F 0.79).

``--serve`` runs the same workload through the serving pipeline
(:class:`doc2tex_tpu.serving.PageServer`): all pages are submitted up
front, detection of page N+1 overlaps recognition of page N on the
device, and crops from concurrent pages coalesce into shared decode
batches — the pages/sec delta vs the sequential loop is the measured
value of the serving overlap.

Run: python tools/page_bench.py [--pages 12] [--quick] [--stitch] [--serve]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PAGE_H, PAGE_W = 1024, 1280  # demo page regime (resize to width 1280)


def synth_gtdb_page(rng, n_regions=6):
    """One page: formula renders pasted at random positions.
    Returns (page u8 (H, W), [(x1, y1, x2, y2), ...])."""
    from doc2tex_tpu.data.synthetic import synth_structured_sample

    page = np.full((PAGE_H, PAGE_W), 255, np.uint8)
    boxes = []
    for _ in range(n_regions):
        img, _ = synth_structured_sample(
            rng, min_len=4, max_len=30, max_h=160, max_w=520
        )
        h, w = img.shape
        for _try in range(20):
            y = int(rng.integers(0, PAGE_H - h))
            x = int(rng.integers(0, PAGE_W - w))
            box = (x, y, x + w, y + h)
            if all(
                box[2] <= b[0] or box[0] >= b[2]
                or box[3] <= b[1] or box[1] >= b[3]
                for b in boxes
            ):
                page[y : y + h, x : x + w] = img
                boxes.append(box)
                break
    return page, boxes


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=12)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--stitch", action="store_true",
                    help="voting stitch instead of page NMS")
    ap.add_argument("--serve", action="store_true",
                    help="overlapped serving pipeline (PageServer) instead "
                    "of the sequential demo loop")
    ap.add_argument("--beam", type=int, default=None,
                    help="override the demo contract's beam size")
    ap.add_argument("--int8-detect", action="store_true",
                    help="int8 SSD trunk (ops/quant.py via "
                    "MathDetector(quantize='int8'))")
    args = ap.parse_args()
    n_pages = 3 if args.quick else args.pages

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from doc2tex_tpu.detection.flow import MathDetector
    from doc2tex_tpu.detection.stitch import stitch_page
    from doc2tex_tpu.recognition import MathRecognition, load_recog_config
    from doc2tex_tpu.tokenizer.vocab import load_vocab

    cfg, _w = load_recog_config(version="version2")
    cfg["character"] = load_vocab(cfg["vocab"])
    if args.quick:
        cfg["batch_max_length"] = 40
    beam = args.beam if args.beam is not None else int(cfg["beam_size"])

    detector = MathDetector(
        quantize="int8" if args.int8_detect else None
    )
    recognizer = MathRecognition(config=cfg, beam_size=beam)
    print(
        f"page bench: {n_pages} pages {PAGE_H}x{PAGE_W}, beam={beam}, "
        f"max_len={cfg['batch_max_length']}, "
        f"{len(cfg['character'])}-token vocab on "
        f"{jax.devices()[0].platform}",
        file=sys.stderr,
    )

    rng = np.random.default_rng(0)
    pages = [synth_gtdb_page(rng) for _ in range(n_pages)]

    def run_page(page, boxes):
        t0 = time.perf_counter()
        if args.stitch:
            raw_b, raw_s = detector.detect_page(page, raw=True)
            bs = (
                np.concatenate([raw_b, raw_s[:, None]], axis=1)
                if len(raw_b) else np.zeros((0, 5), np.float32)
            )
            det_boxes = stitch_page(bs, page.shape[:2], page_image=page)
        else:
            det_boxes, _scores = detector.detect_page(page)
        t_det = time.perf_counter() - t0
        # deterministic workload: recognize the gt crops (see module doc)
        crops = [page[y1:y2, x1:x2] for (x1, y1, x2, y2) in boxes]
        t0 = time.perf_counter()
        latexes = recognizer(crops)
        t_rec = time.perf_counter() - t0
        return t_det, t_rec, len(det_boxes), latexes

    # warmup/compile on the first page (all window + crop-bucket shapes)
    t0 = time.perf_counter()
    run_page(*pages[0])
    compile_s = time.perf_counter() - t0
    print(f"compile+first page: {compile_s:.1f}s", file=sys.stderr)

    extra = {}
    if args.serve:
        # overlapped pipeline: detection of page N+1 runs while page N's
        # crops decode; crops from concurrent pages share decode batches
        from doc2tex_tpu.serving import PageServer, RecognitionServer

        gt = {id(p): b for p, b in pages}

        def detect_and_crop(page):
            if args.stitch:
                raw_b, raw_s = detector.detect_page(page, raw=True)
                bs = (
                    np.concatenate([raw_b, raw_s[:, None]], axis=1)
                    if len(raw_b) else np.zeros((0, 5), np.float32)
                )
                stitch_page(bs, page.shape[:2], page_image=page)
            else:
                detector.detect_page(page)
            # deterministic workload: recognize the gt crops (module doc)
            boxes = gt[id(page)]
            crops = [page[y1:y2, x1:x2] for (x1, y1, x2, y2) in boxes]
            return boxes, crops

        crop_srv = RecognitionServer(
            recognizer, max_batch=64, batch_window_ms=5.0,
            bucket_key=recognizer.bucket_key,
        )
        ps = PageServer(detect_and_crop, crop_srv, max_queue=max(n_pages, 32))
        # full untimed pass: the coalesced (bucket, batch) decode shapes
        # differ from the sequential warmup's, so trace/compile them all
        # before timing (persistent cache makes this fast on re-runs)
        t0 = time.perf_counter()
        for f in [ps.submit_page(p) for p, _ in pages]:
            f.result(timeout=3600)
        print(f"serve warmup pass: {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)
        t_all0 = time.perf_counter()
        futs = [ps.submit_page(p) for p, _ in pages]
        outs = [f.result(timeout=3600) for f in futs]
        wall = time.perf_counter() - t_all0
        n_crops = sum(len(o) for o in outs)
        st = ps.stats()
        ps.close()
        crop_srv.close()
        extra = {"avg_decode_batch": st["crop_server"]["avg_batch"]}
        det_t = rec_t = None
    else:
        det_t = rec_t = 0.0
        n_crops = 0
        t_all0 = time.perf_counter()
        for page, boxes in pages:
            td, tr, nb, _ = run_page(page, boxes)
            det_t += td
            rec_t += tr
            n_crops += len(boxes)
        wall = time.perf_counter() - t_all0
    pps = n_pages / wall

    result = {
        "metric": (
            "full-page pipeline pages/sec (detect+NMS"
            + ("/stitch" if args.stitch else "")
            + (", overlapped serving" if args.serve else "")
            + f" -> crop -> beam-{beam} recognition, "
            f"{PAGE_H}x{PAGE_W} pages)"
        ),
        "value": round(pps, 3),
        "unit": "pages/sec",
        "pages": n_pages,
        "crops": n_crops,
        **extra,
    }
    if det_t is not None:
        result["detect_ms_per_page"] = round(det_t / n_pages * 1e3, 1)
        result["recognize_ms_per_page"] = round(rec_t / n_pages * 1e3, 1)
    base_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "page_baseline_measured.json",
    )
    if os.path.exists(base_path):
        with open(base_path) as f:
            base = json.load(f)["pages_per_sec"]
        result["vs_baseline"] = round(pps / base, 2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
