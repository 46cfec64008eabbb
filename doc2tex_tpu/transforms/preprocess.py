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


def clahe(
    img: np.ndarray, clip_limit: float = 2.0, grid: tuple[int, int] = (2, 2)
) -> np.ndarray:
    """Contrast-limited adaptive histogram equalization (OpenCV-compatible).

    The demo recognizer preprocess applies ``alb.CLAHE(clip_limit=2,
    tile_grid_size=(2, 2), always_apply=True)`` before normalization
    (reference ``demo/HybridViT/helper.py:40-52``); this is the same
    algorithm in numpy: per-tile clip-limited histogram equalization with
    bilinear interpolation between the four neighboring tile mappings.
    """
    assert img.ndim == 2, "clahe expects a grayscale HxW image"
    h, w = img.shape
    gh, gw = grid
    th, tw = -(-h // gh), -(-w // gw)  # ceil tile size (OpenCV pads)
    pad_h, pad_w = th * gh - h, tw * gw - w
    padded = np.pad(img, ((0, pad_h), (0, pad_w)), mode="reflect")

    # per-tile clipped-CDF mapping tables (gh, gw, 256)
    maps = np.empty((gh, gw, 256), np.float32)
    n_tile = th * tw
    clip = max(int(clip_limit * n_tile / 256.0), 1)
    for i in range(gh):
        for j in range(gw):
            tile = padded[i * th:(i + 1) * th, j * tw:(j + 1) * tw]
            hist = np.bincount(tile.ravel(), minlength=256).astype(np.int64)
            excess = np.maximum(hist - clip, 0).sum()
            hist = np.minimum(hist, clip) + excess // 256
            # OpenCV distributes the residual over the leading bins
            hist[: int(excess % 256)] += 1
            cdf = np.cumsum(hist)
            maps[i, j] = cdf * (255.0 / n_tile)

    # bilinear interpolation of mapping between tile centers
    ys, xs = np.arange(h), np.arange(w)
    fy = (ys + 0.5) / th - 0.5
    fx = (xs + 0.5) / tw - 0.5
    y0 = np.clip(np.floor(fy).astype(int), 0, gh - 1)
    x0 = np.clip(np.floor(fx).astype(int), 0, gw - 1)
    y1 = np.minimum(y0 + 1, gh - 1)
    x1 = np.minimum(x0 + 1, gw - 1)
    wy = np.clip(fy - y0, 0.0, 1.0)[:, None].astype(np.float32)
    wx = np.clip(fx - x0, 0.0, 1.0)[None, :].astype(np.float32)

    v = img.astype(int)
    m00 = maps[y0[:, None], x0[None, :], v]
    m01 = maps[y0[:, None], x1[None, :], v]
    m10 = maps[y1[:, None], x0[None, :], v]
    m11 = maps[y1[:, None], x1[None, :], v]
    out = (
        (1 - wy) * ((1 - wx) * m00 + wx * m01)
        + wy * ((1 - wx) * m10 + wx * m11)
    )
    return np.clip(np.round(out), 0, 255).astype(np.uint8)
