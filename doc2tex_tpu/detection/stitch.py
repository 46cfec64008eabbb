"""Page-level stitching of windowed detections via pixel voting.

Parity target: the reference's GTDB stitching stack
(``demo/ScanSSD/gtdb/stitch_patches_pdf.py:87-245``): every sliding-window
detection casts votes onto a page-size accumulator (four algorithms:
equal / sum / max / avg of confidences), the accumulator is thresholded,
connected components become region boxes, and each box is optionally
fitted to the ink (``gtdb/fit_box.py``: contract to content, then expand
over connected components crossing the box).

The demo inference path uses plain NMS (``demo/app.py:152``,
``detection/boxes.py`` here); voting-stitch is the higher-recall option
the reference uses for full-PDF processing and evaluation.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
from scipy import ndimage


def vote_for_regions(
    boxes_scores: np.ndarray,
    page_hw: tuple[int, int],
    algorithm: str = "equal",
    thresh_votes: float = 30,
) -> np.ndarray:
    """(N,5) [x1,y1,x2,y2,score] page-space detections -> binary vote mask.

    Algorithms per reference ``vote_for_regions``/``voting_*``
    (stitch_patches_pdf.py:87-163); ``equal`` counts overlapping windows,
    ``sum``/``avg`` accumulate confidences, ``max`` keeps the highest.
    """
    h, w = page_hw
    votes = np.zeros((h, w), np.float32)
    b = np.asarray(boxes_scores, np.float32).reshape(-1, 5)

    def sl(box):
        x1, y1, x2, y2 = (int(v) for v in box[:4])
        return slice(max(y1, 0), max(y2, 0)), slice(max(x1, 0), max(x2, 0))

    if algorithm == "sum":
        for box in b:
            ys, xs = sl(box)
            votes[ys, xs] += box[4]
    elif algorithm == "max":
        for box in b[b[:, 4].argsort()]:
            ys, xs = sl(box)
            votes[ys, xs] = box[4]
    elif algorithm == "avg":
        counts = np.zeros_like(votes)
        for box in b:
            ys, xs = sl(box)
            votes[ys, xs] += box[4]
            counts[ys, xs] += 1
        counts[counts == 0] = 1
        votes /= counts
    else:  # "equal"
        for box in b:
            ys, xs = sl(box)
            votes[ys, xs] += 1

    return (votes >= thresh_votes).astype(np.uint8)


def fit_box(im_bw: np.ndarray, box, components=None) -> list[int]:
    """Contract a box to its ink, then expand it over every connected
    component it touches (reference ``fit_box.adjust_box``: contract +
    BFS expand — component-union is the vectorized equivalent).

    ``components``: optional precomputed ``(labeled, slices)`` of
    ``im_bw`` so callers fitting many boxes label the page once.
    """
    x1, y1, x2, y2 = (int(round(v)) for v in box[:4])
    region = im_bw[y1:y2, x1:x2]
    if region.size == 0 or not region.any():
        return [0, 0, 0, 0]
    rows = np.flatnonzero(region.any(axis=1))
    cols = np.flatnonzero(region.any(axis=0))
    x1c, y1c = x1 + cols[0], y1 + rows[0]
    x2c, y2c = x1 + cols[-1] + 1, y1 + rows[-1] + 1

    if components is None:
        components = _ink_components(im_bw)
    labeled, slices = components
    touching = np.unique(labeled[y1c:y2c, x1c:x2c])
    touching = touching[touching != 0]
    if touching.size == 0:
        return [x1c, y1c, x2c, y2c]
    for comp in touching:
        ys, xs = slices[comp - 1]
        x1c, y1c = min(x1c, xs.start), min(y1c, ys.start)
        x2c, y2c = max(x2c, xs.stop), max(y2c, ys.stop)
    return [x1c, y1c, x2c, y2c]


def _ink_components(im_bw: np.ndarray):
    labeled, _ = ndimage.label(im_bw, structure=np.ones((3, 3), int))
    return labeled, ndimage.find_objects(labeled)


def _to_ink_mask(page_image: np.ndarray) -> np.ndarray:
    """uint8 page (grayscale or RGB) -> binary ink mask (ink dark)."""
    img = np.asarray(page_image)
    if img.ndim == 3:  # RGB page: reduce like fit_box.convert_to_binary
        img = np.round(img.astype(np.float32).mean(axis=-1)).astype(np.uint8)
    return (img <= 127).astype(np.uint8)


def stitch_page(
    boxes_scores: np.ndarray,
    page_hw: tuple[int, int],
    page_image: Optional[np.ndarray] = None,
    algorithm: str = "equal",
    thresh_votes: float = 30,
    postprocess: bool = True,
) -> list[list[int]]:
    """Windowed detections -> stitched page regions
    (reference ``voting_algo``, stitch_patches_pdf.py:203-245).

    ``page_image``: uint8 grayscale (ink dark); needed for fit-to-ink
    postprocess, skipped when absent.
    """
    votes = vote_for_regions(boxes_scores, page_hw, algorithm, thresh_votes)
    labeled, n = ndimage.label(votes, structure=np.ones((3, 3), int))
    im_bw = components = None
    if page_image is not None and postprocess:
        im_bw = _to_ink_mask(page_image)
        components = _ink_components(im_bw)  # label the page ONCE

    boxes: list[list[int]] = []
    for ys, xs in ndimage.find_objects(labeled):
        box = [xs.start, ys.start, xs.stop, ys.stop]
        if im_bw is not None:
            box = fit_box(im_bw, box, components)
        if box[2] - box[0] < 1 or box[3] - box[1] < 1:
            continue
        boxes.append(box)
    return boxes
