"""PDF-level voting-stitch driver (VERDICT r2 missing #2).

Parity target: reference ``demo/ScanSSD/gtdb/stitch_patches_pdf.py:203-317``
(``stitch``/``voting_algo``): read each PDF's raw windowed detections
(rows ``page,x1,y1,x2,y2,score``), group by page, voting-stitch every page
(with optional math-region preprocessing + fit-to-ink against the page
image), fan the pages out over a worker pool, and append the stitched
regions to ``<output_dir>/<pdf>.csv`` as ``page,x1,y1,x2,y2`` (fmt %.2f).

Two modes:

* CSV mode (the reference flow): ``--data_file pdfs.txt --detections_dir
  det/ --images_dir imgs/`` — stitches pre-computed detections.
* Live mode: ``--pages 'scans/*.png'`` — runs the SSD detector on each
  page first (one jitted detector shared across pages; the TPU is the
  parallelism), then stitches.  This is the path a user without a
  detections dump takes.

The per-page fan-out uses a process pool like the reference
(``--num_workers``; default 1 — this container has a single core, and the
vectorized numpy stitch is fast enough that the pool only pays off on
real multi-core hosts).
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from doc2tex_tpu.detection.stitch import stitch_page


def _read_math(path: str) -> np.ndarray:
    """Read a raw-detection CSV: rows page,x1,y1,x2,y2[,score]."""
    data = np.genfromtxt(path, delimiter=",")
    if data.ndim == 1:
        data = data[None, :]
    return data


def _load_page_image(images_dir: str, pdf: str, page: int):
    # reference layout: <images_dir>/<pdf>/<page+1>.png
    path = os.path.join(images_dir, pdf, f"{page + 1}.png")
    if not os.path.exists(path):
        return None
    from PIL import Image

    return np.asarray(Image.open(path).convert("L"), np.uint8)


def _stitch_one(task):
    """One page's voting stitch (pool worker)."""
    pdf, page, boxes_scores, page_image, page_hw, thresh_votes, algo = task
    if page_image is not None:
        page_hw = page_image.shape[:2]
    boxes = stitch_page(
        boxes_scores, page_hw, page_image=page_image,
        algorithm=algo, thresh_votes=thresh_votes,
    )
    return pdf, page, boxes


def _write_results(output_dir: str, results) -> list[str]:
    written = []
    for pdf, page, boxes in results:
        if not boxes:
            continue
        out_path = os.path.join(output_dir, pdf + ".csv")
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
        rows = np.concatenate(
            [np.full((len(boxes), 1), float(page)), np.asarray(boxes, float)],
            axis=1,
        )
        with open(out_path, "a") as f:
            np.savetxt(f, rows, fmt="%.2f", delimiter=",")
        written.append(out_path)
    return written


def stitch_from_csvs(
    data_file: str, detections_dir: str, images_dir: str | None,
    output_dir: str, thresh_votes: float = 30, algorithm: str = "equal",
    num_workers: int = 1, default_page_hw=(1024, 1280),
) -> list[str]:
    with open(data_file) as f:
        pdfs = [ln.strip() for ln in f if ln.strip()]
    tasks = []
    for pdf in pdfs:
        det = _read_math(os.path.join(detections_dir, pdf + ".csv"))
        for page in np.unique(det[:, 0]):
            rows = det[det[:, 0] == page][:, 1:]
            if rows.shape[1] == 4:  # no score column: weight equally
                rows = np.concatenate(
                    [rows, np.ones((len(rows), 1))], axis=1
                )
            img = (
                _load_page_image(images_dir, pdf, int(page))
                if images_dir else None
            )
            tasks.append((pdf, int(page), rows, img, default_page_hw,
                          thresh_votes, algorithm))
    if num_workers > 1:
        from multiprocessing import Pool

        with Pool(num_workers) as pool:
            results = pool.map(_stitch_one, tasks)
    else:
        results = [_stitch_one(t) for t in tasks]
    return _write_results(output_dir, results)


def stitch_live(
    pages_glob: str, output_dir: str, thresh_votes: float = 30,
    algorithm: str = "equal", conf_thresh: float = 0.5,
) -> list[str]:
    """Detect + stitch page images matching ``pages_glob`` (one shared
    jitted detector; pages stream through the device sequentially)."""
    from doc2tex_tpu.detection.flow import MathDetector

    detector = MathDetector(conf_thresh=conf_thresh)
    results = []
    for i, path in enumerate(sorted(glob.glob(pages_glob))):
        from PIL import Image

        page = np.asarray(Image.open(path).convert("L"), np.uint8)
        raw_boxes, raw_scores = detector.detect_page(page, raw=True)
        bs = (
            np.concatenate([raw_boxes, raw_scores[:, None]], axis=1)
            if len(raw_boxes) else np.zeros((0, 5), np.float32)
        )
        name = os.path.splitext(os.path.basename(path))[0]
        results.append(_stitch_one(
            ("pages", i, bs, page, page.shape[:2], thresh_votes, algorithm)
        ))
        print(f"{path}: {len(results[-1][2])} regions", file=sys.stderr)
    return _write_results(output_dir, results)


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_file", help="text file listing pdf names")
    p.add_argument("--detections_dir",
                   help="dir of <pdf>.csv raw detections")
    p.add_argument("--images_dir", default=None,
                   help="dir of <pdf>/<page>.png page images "
                   "(enables fit-to-ink postprocess)")
    p.add_argument("--pages", default=None,
                   help="glob of page images for live detect+stitch")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--thresh_votes", type=float, default=30)
    p.add_argument("--algorithm", default="equal",
                   choices=["equal", "sum", "max", "avg"])
    p.add_argument("--num_workers", type=int, default=1)
    p.add_argument("--conf_thresh", type=float, default=0.5)
    args = p.parse_args()

    if args.pages:
        written = stitch_live(
            args.pages, args.output_dir, args.thresh_votes,
            args.algorithm, args.conf_thresh,
        )
    else:
        if not (args.data_file and args.detections_dir):
            p.error("need --pages OR --data_file + --detections_dir")
        written = stitch_from_csvs(
            args.data_file, args.detections_dir, args.images_dir,
            args.output_dir, args.thresh_votes, args.algorithm,
            args.num_workers,
        )
    print(f"wrote {len(written)} page row-groups under {args.output_dir}")


if __name__ == "__main__":
    main()
