"""Detection evaluation: precision/recall/F1 at IoU thresholds.

Parity target: the reference's vendored GTDB scoring stack
(``demo/ScanSSD/gtdb/`` + ``IOU_lib/``, ~4k LoC): page-level detection
quality measured by IoU matching between predicted and ground-truth math
regions.  Implemented here as a compact greedy matcher producing
precision / recall / F1 at configurable IoU thresholds (the standard
IoU>=0.5 / >=0.75 operating points used by the ScanSSD paper).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np


def iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(N,4) x (M,4) corner boxes -> (N,M) IoU."""
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)), np.float32)
    area_a = np.maximum(a[:, 2] - a[:, 0], 0) * np.maximum(a[:, 3] - a[:, 1], 0)
    area_b = np.maximum(b[:, 2] - b[:, 0], 0) * np.maximum(b[:, 3] - b[:, 1], 0)
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.maximum(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    return inter / np.maximum(area_a[:, None] + area_b[None, :] - inter, 1e-9)


def match_detections(
    pred_boxes: np.ndarray,
    pred_scores: np.ndarray,
    gt_boxes: np.ndarray,
    iou_thresh: float = 0.5,
) -> tuple[int, int, int]:
    """Greedy score-ordered matching -> (tp, fp, fn)."""
    order = np.argsort(-np.asarray(pred_scores))
    matched = np.zeros(len(gt_boxes), bool)
    iou = iou_matrix(np.asarray(pred_boxes, np.float32).reshape(-1, 4),
                     np.asarray(gt_boxes, np.float32).reshape(-1, 4))
    tp = fp = 0
    for i in order:
        if iou.shape[1] == 0:
            fp += 1
            continue
        cand = np.where(~matched, iou[i], -1.0)
        j = int(np.argmax(cand))
        if cand[j] >= iou_thresh:
            matched[j] = True
            tp += 1
        else:
            fp += 1
    fn = int((~matched).sum())
    return tp, fp, fn


def evaluate_detections(
    predictions: Sequence[tuple[np.ndarray, np.ndarray]],
    ground_truths: Sequence[np.ndarray],
    iou_thresholds: Sequence[float] = (0.5, 0.75),
) -> dict:
    """Corpus metrics over pages.

    ``predictions``: per-page (boxes (K,4), scores (K,));
    ``ground_truths``: per-page gt boxes (M,4).
    """
    out: dict = {}
    for thr in iou_thresholds:
        tp = fp = fn = 0
        for (pb, ps), gb in zip(predictions, ground_truths):
            t, f, n = match_detections(pb, ps, gb, thr)
            tp, fp, fn = tp + t, fp + f, fn + n
        prec = tp / max(tp + fp, 1)
        rec = tp / max(tp + fn, 1)
        f1 = 2 * prec * rec / max(prec + rec, 1e-9)
        out[f"precision@{thr}"] = prec
        out[f"recall@{thr}"] = rec
        out[f"f1@{thr}"] = f1
    return out
