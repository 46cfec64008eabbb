"""Image-based prediction evaluation: column-wise edit distance.

Parity target: reference ``img_edit_distance`` + driver
(``doc2tex/tools/result_evaluate/evaluate_images.py:51-164,192-360``):
re-render prediction and gold LaTeX to PNGs, transpose + trim + binarize,
treat each pixel COLUMN as a symbol (bitstring), Levenshtein over the
column sequences; "w/o space" variant first drops blank columns; the fuzzy
match clusters columns whose pixel difference is < 5 into the same symbol.

The inner Levenshtein runs on the native C++ kernel over column-id arrays
(replacing the vendored pure-Python ``distance`` package / optional
cdistance C ext).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def trim_image(img: np.ndarray, thresh: int = 255) -> np.ndarray:
    """Crop all-white border rows/cols (reference trim_image)."""
    mask = img < thresh
    rows = np.flatnonzero(mask.any(axis=1))
    cols = np.flatnonzero(mask.any(axis=0))
    if rows.size == 0 or cols.size == 0:
        return img[:1, :1]
    return img[rows[0] : rows[-1] + 1, cols[0] : cols[-1] + 1]


def _column_bits(img: np.ndarray) -> np.ndarray:
    """uint8 grayscale (H, W) -> (W, H) binary column matrix."""
    t = trim_image(img).T  # (W, H): rows are image columns
    return (t <= 128).astype(np.uint8)


def _pad_cols(a: np.ndarray, b: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    h = max(a.shape[1], b.shape[1])
    a = np.pad(a, ((0, 0), (0, h - a.shape[1])))
    b = np.pad(b, ((0, 0), (0, h - b.shape[1])))
    return a, b


def _exact_ids(cols_a: np.ndarray, cols_b: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Map identical columns to identical ids (exact bitstring equality)."""
    table: dict[bytes, int] = {}

    def ids(cols):
        out = np.empty(len(cols), np.uint32)
        for i, c in enumerate(cols):
            out[i] = table.setdefault(c.tobytes(), len(table))
        return out

    return ids(cols_a), ids(cols_b)


def _fuzzy_ids(
    cols_a: np.ndarray, cols_b: np.ndarray, tol: int = 5
) -> tuple[np.ndarray, np.ndarray]:
    """Cluster near-identical columns (pixel diff < tol) to one id
    (reference ``make_strs`` :254-276)."""
    reps: list[np.ndarray] = []
    cache: dict[bytes, int] = {}

    def assign(col: np.ndarray) -> int:
        key = col.tobytes()
        if key in cache:
            return cache[key]
        for rid, rep in enumerate(reps):
            if np.abs(col.astype(np.int16) - rep.astype(np.int16)).sum() < tol:
                cache[key] = rid
                return rid
        reps.append(col)
        cache[key] = len(reps) - 1
        return len(reps) - 1

    ids_a = np.array([assign(c) for c in cols_a], np.uint32)
    ids_b = np.array([assign(c) for c in cols_b], np.uint32)
    return ids_a, ids_b


def _lev_ids(a: np.ndarray, b: np.ndarray) -> int:
    try:
        from ..native import _load
        import ctypes

        lib = _load()
        aa = np.ascontiguousarray(a, np.uint32)
        bb = np.ascontiguousarray(b, np.uint32)
        return lib.d2t_lev_u32(
            aa.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), len(aa),
            bb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), len(bb),
        )
    except Exception:
        from ..eval.metrics import _lev_py

        return _lev_py(a.tolist(), b.tolist())


def img_edit_distance(
    im1: np.ndarray, im2: Optional[np.ndarray]
) -> tuple[int, int, bool, bool]:
    """(edit_distance, n_ref_columns, match_w_space, match_wo_space).

    ``im1`` is the gold render, ``im2`` the prediction render (None if it
    failed to render — counts as fully wrong, reference :247-248).
    """
    cols1 = _column_bits(np.asarray(im1, np.uint8))
    if im2 is None:
        return len(cols1), len(cols1), False, False
    cols2 = _column_bits(np.asarray(im2, np.uint8))
    cols1, cols2 = _pad_cols(cols1, cols2)

    ids1, ids2 = _exact_ids(cols1, cols2)
    ed = _lev_ids(ids1, ids2)

    if ed == 0:
        return 0, len(cols1), True, True

    # fuzzy match over clustered columns (w/ spaces)
    f1, f2 = _fuzzy_ids(cols1, cols2)
    match_w = _lev_ids(f1, f2) == 0

    # w/o spaces: drop blank columns first (reference seq_eliminate)
    nz1 = cols1[cols1.any(axis=1)]
    nz2 = cols2[cols2.any(axis=1)]
    g1, g2 = _fuzzy_ids(nz1, nz2)
    match_wo = _lev_ids(g1, g2) == 0

    return ed, len(cols1), match_w, match_wo


def evaluate_image_pairs(
    pairs: Sequence[tuple[np.ndarray, Optional[np.ndarray]]],
) -> dict:
    """Aggregate metrics over (gold, pred) image pairs
    (reference driver :51-164)."""
    total_ed = total_ref = total_num = 0
    correct_w = correct_wo = 0
    per_sample = []
    for gold, pred in pairs:
        ed, ref, m1, m2 = img_edit_distance(gold, pred)
        total_ed += ed
        total_ref += ref
        total_num += 1
        correct_w += int(m1)
        correct_wo += int(m2)
        per_sample.append(
            {"ed": ed, "ref": ref, "match_w_space": m1, "match_wo_space": m2}
        )
    return {
        "accuracy_w_space": correct_w / total_num if total_num else 0.0,
        "accuracy_wo_space": correct_wo / total_num if total_num else 0.0,
        "image_edit_distance": (
            1.0 - total_ed / total_ref if total_ref else 0.0
        ),
        "n": total_num,
        "per_sample": per_sample,
    }
