"""LMDB dataset builder CLI.

Parity target: reference ``createDataset``
(``doc2tex/tools/lmdb_builders/create_lmdb_dataset.py:36-98``): CSV manifest
(id<TAB>label) + image dir -> LMDB with PNG image bytes, labels, names,
int32 h/w sidecars, 1000-entry write batches, ``num-samples`` key.

Usage:
    python -m doc2tex_tpu.tools.lmdb_builder --csv labels.csv \
        --image_dir imgs/ --out train_data/
"""

from __future__ import annotations

import argparse
import csv
import os
from typing import Iterator

import numpy as np


def iter_manifest(csv_path: str, image_dir: str) -> Iterator[tuple[np.ndarray, str, str]]:
    from PIL import Image

    with open(csv_path, newline="") as f:
        # QUOTE_NONE: LaTeX labels legitimately contain `"` — default csv
        # quoting silently merges such rows with their neighbours
        reader = csv.reader(f, delimiter="\t", quoting=csv.QUOTE_NONE)
        rows = [r for r in reader if len(r) >= 2]
    if rows and rows[0][0].lower() in ("id", "image", "name"):
        rows = rows[1:]
    for name, label in ((r[0], r[1]) for r in rows):
        path = os.path.join(image_dir, name)
        if not os.path.exists(path):
            continue
        img = np.asarray(Image.open(path).convert("L"), np.uint8)
        yield img, label, name


def build(csv_path: str, image_dir: str, out_path: str, map_size: int = 1 << 34) -> int:
    from ..data.lmdb_reader import write_lmdb

    images, labels, names = [], [], []
    for img, label, name in iter_manifest(csv_path, image_dir):
        images.append(img)
        labels.append(label)
        names.append(name)
    write_lmdb(out_path, images, labels, names, map_size=map_size)
    return len(images)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--csv", required=True, help="id<TAB>label manifest")
    p.add_argument("--image_dir", required=True)
    p.add_argument("--out", required=True, help="output LMDB directory")
    p.add_argument("--map_size", type=int, default=1 << 34)
    args = p.parse_args()
    n = build(args.csv, args.image_dir, args.out, args.map_size)
    print(f"wrote {n} samples to {args.out}")


if __name__ == "__main__":
    main()
