"""Inference-time image preprocessing (host side).

Parity target: reference ``resize``
(``doc2tex/utils/predict_utils.py:14-115``) and its helpers ``minmax_size``
(``doc2tex/utils/data_utils.py:62-82``) and ``pad``
(``data_utils.py:10-47``): grayscale, optional downsample, clamp to
[min_dimension, max_dimension] with divisible-by-scale_factor snapping,
white pad to the snapped size.

Output is uint8; normalization happens on device (transforms.augment).
"""

from __future__ import annotations

import numpy as np


def _resize_area(img: np.ndarray, h: int, w: int) -> np.ndarray:
    """Box-filter downscale (cv2 INTER_AREA equivalent) / bilinear upscale."""
    ih, iw = img.shape[:2]
    if h == ih and w == iw:
        return img
    try:
        from PIL import Image

        mode = Image.LANCZOS if (h < ih or w < iw) else Image.BILINEAR
        return np.asarray(
            Image.fromarray(img).resize((w, h), resample=mode), dtype=img.dtype
        )
    except ImportError:  # pragma: no cover - numpy fallback
        ys = np.linspace(0, ih - 1, h).astype(np.int64)
        xs = np.linspace(0, iw - 1, w).astype(np.int64)
        return img[ys][:, xs]


def minmax_size(
    h: int,
    w: int,
    max_dimension: tuple[int, int],
    min_dimension: tuple[int, int],
) -> tuple[int, int]:
    """Clamp (h, w) into [min, max] preserving aspect ratio
    (reference data_utils.py:62-82)."""
    ratios = [h / max_dimension[0], w / max_dimension[1]]
    if any(r > 1 for r in ratios):
        s = max(ratios)
        h, w = int(h / s), int(w / s)
    ratios = [h / min_dimension[0], w / min_dimension[1]]
    if any(r < 1 for r in ratios):
        s = min(ratios)
        h, w = int(np.ceil(h / s)), int(np.ceil(w / s))
    return h, w


def resize_for_inference(
    img: np.ndarray,
    config,
) -> np.ndarray:
    """Grayscale uint8 (H, W) -> preprocessed uint8 at a divisible size."""
    if img.ndim == 3:
        img = np.round(img.astype(np.float32).mean(axis=-1)).astype(np.uint8)
    ds = config.get("downsample", 1) or 1
    h, w = img.shape
    if ds > 1 and h / ds >= config["min_dimension"][0] and w / ds >= config["min_dimension"][1]:
        img = _resize_area(img, int(h / ds), int(w / ds))
        h, w = img.shape
    h, w = minmax_size(h, w, tuple(config["max_dimension"]), tuple(config["min_dimension"]))
    img = _resize_area(img, h, w)
    sf = config.get("scale_factor", 32)
    ph = -(-h // sf) * sf - h
    pw = -(-w // sf) * sf - w
    if ph or pw:
        img = np.pad(img, ((0, ph), (0, pw)), constant_values=255)
    return img


def learned_resize(
    img: np.ndarray,
    predict_width_bucket,
    bucket_px: int = 32,
    max_iters: int = 10,
    tol_px: int = 16,
) -> np.ndarray:
    """Learned-resizer loop (reference ``predict_utils.py:14-115`` +
    ``demo/HybridViT/helper.py:164-195``): a width-bucket classifier
    (``models.extras.LearnedResizer``) predicts the best target width;
    resize and re-predict until stable or ``max_iters``.

    ``predict_width_bucket(img_u8) -> int`` returns the bucket index
    (target width = (idx + 1) * bucket_px).
    """
    for _ in range(max_iters):
        idx = int(predict_width_bucket(img))
        target_w = (idx + 1) * bucket_px
        h, w = img.shape[:2]
        if abs(target_w - w) <= tol_px:
            break
        new_h = max(int(round(h * target_w / w)), 1)
        img = _resize_area(img, new_h, target_w)
    return img
