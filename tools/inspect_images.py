"""Visual inspection drivers for rendered-image evaluation.

Parity targets (reference ``doc2tex/tools/result_evaluate/``):

* ``merge_img.py:12-58`` — stack the gold render above the pred render
  (right-padded to a common width) into one compare sheet per formula,
  for eyeballing mismatches flagged by the image metrics.
* ``split_image_folder.py:7-35`` — given the un-matched name list the
  image evaluator writes, copy renders into ``match/`` / ``un_match/``
  siblings of the input dir.  Unlike the reference we do NOT delete the
  input dir unless ``--rm-input`` is passed.

Usage:
    python tools/inspect_images.py merge  PRED_DIR GOLD_DIR OUT_DIR
    python tools/inspect_images.py split  UNMATCH_LIST INPUT_DIR [--rm-input]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
from pathlib import Path

import numpy as np


def vstack_autopad(images, pad_value: int = 0) -> np.ndarray:
    """Vertically stack images, right-padding each to the widest width.

    Accepts (H, W) or (H, W, C) arrays; mixed channel counts are unified
    to the maximum (grayscale broadcast to RGB).
    """
    arrs = [np.asarray(im) for im in images]
    if not arrs:
        raise ValueError("no images to stack")
    max_c = max(1 if a.ndim == 2 else a.shape[2] for a in arrs)
    max_w = max(a.shape[1] for a in arrs)
    rows = []
    for a in arrs:
        if a.ndim == 2 and max_c > 1:
            a = np.repeat(a[:, :, None], max_c, axis=2)
        pad = [(0, 0), (0, max_w - a.shape[1])] + (
            [(0, 0)] if a.ndim == 3 else []
        )
        rows.append(np.pad(a, pad, constant_values=pad_value))
    return np.vstack(rows)


def build_compare_sheets(pred_dir, gold_dir, out_dir) -> int:
    """For every gold render with a same-named pred render, write a
    gold-over-pred compare sheet to ``out_dir``.  Returns the sheet count.

    Match: reference ``merge_img.py:38-58`` (gold stacked above pred;
    failures skipped, not fatal)."""
    from PIL import Image

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    n = 0
    for name in sorted(os.listdir(gold_dir)):
        pred_path = Path(pred_dir) / name
        if not pred_path.exists():
            continue
        try:
            gold = np.asarray(Image.open(Path(gold_dir) / name).convert("RGB"))
            pred = np.asarray(Image.open(pred_path).convert("RGB"))
            sheet = vstack_autopad((gold, pred))
            Image.fromarray(sheet).save(out_dir / name)
            n += 1
        except Exception as exc:  # noqa: BLE001 — per-image, like the ref
            print(f"skip {name}: {exc}", file=sys.stderr)
    return n


def split_by_match(list_file, input_dir, rm_input: bool = False) -> dict:
    """Copy renders into ``match``/``un_match`` siblings of ``input_dir``
    based on the un-matched name list (one path or name per line).

    Match: reference ``split_image_folder.py:7-35``; the destructive
    ``rmtree(input_dir)`` is opt-in here."""
    input_dir = Path(input_dir)
    unmatch_dir = input_dir.parent / "un_match"
    match_dir = input_dir.parent / "match"
    unmatch_dir.mkdir(exist_ok=True)
    match_dir.mkdir(exist_ok=True)

    with open(list_file) as f:
        un_match = {os.path.basename(line.strip()) for line in f if line.strip()}

    counts = {"match": 0, "un_match": 0}
    for name in os.listdir(input_dir):
        src = input_dir / name
        if not src.is_file():
            continue
        if name in un_match:
            shutil.copy(src, unmatch_dir / name)
            counts["un_match"] += 1
        else:
            shutil.copy(src, match_dir / name)
            counts["match"] += 1
    if rm_input:
        shutil.rmtree(input_dir)
    return counts


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n", 1)[0])
    sub = ap.add_subparsers(dest="cmd", required=True)
    m = sub.add_parser("merge", help="gold-over-pred compare sheets")
    m.add_argument("pred_dir")
    m.add_argument("gold_dir")
    m.add_argument("out_dir")
    s = sub.add_parser("split", help="split renders into match/un_match")
    s.add_argument("unmatch_list")
    s.add_argument("input_dir")
    s.add_argument("--rm-input", action="store_true",
                   help="delete input_dir afterwards (reference behavior)")
    args = ap.parse_args(argv)

    if args.cmd == "merge":
        n = build_compare_sheets(args.pred_dir, args.gold_dir, args.out_dir)
        print(f"wrote {n} compare sheets to {args.out_dir}")
    else:
        counts = split_by_match(
            args.unmatch_list, args.input_dir, rm_input=args.rm_input
        )
        print(f"match: {counts['match']}  un_match: {counts['un_match']}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
