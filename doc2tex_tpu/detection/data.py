"""GTDB-style detection data: page annotations -> SSD training windows.

Parity target: reference ``GTDBDetection`` (``demo/ScanSSD/data/
gtdb_new.py``): page images with ``.pmath`` box annotations (one
``x1,y1,x2,y2`` per line), sliced into 512x512 training windows whose
targets are the normalized math boxes intersecting each window.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

from .windows import rolling_windows


def read_pmath(path: str) -> np.ndarray:
    """Parse a .pmath annotation file -> (N, 4) float boxes (page pixels)."""
    boxes = []
    with open(path) as f:
        for line in f:
            parts = [p for p in line.replace(",", " ").split() if p]
            if len(parts) >= 4:
                boxes.append([float(v) for v in parts[:4]])
    return np.asarray(boxes, np.float32).reshape(-1, 4)


def window_targets(
    boxes: np.ndarray,
    info: Sequence[tuple[int, int, int, int]],
    window: int = 512,
    min_overlap: float = 0.25,
    max_boxes: int = 32,
) -> tuple[np.ndarray, np.ndarray]:
    """Assign page boxes to windows.

    Returns (gt (W, max_boxes, 4) window-normalized corner boxes,
    valid (W, max_boxes) bool).  A box joins a window when >= min_overlap
    of its area falls inside (reference gtdb_new.py box filtering).
    """
    W = len(info)
    gt = np.zeros((W, max_boxes, 4), np.float32)
    valid = np.zeros((W, max_boxes), bool)
    if len(boxes) == 0:
        return gt, valid
    area = np.maximum(boxes[:, 2] - boxes[:, 0], 1e-6) * np.maximum(
        boxes[:, 3] - boxes[:, 1], 1e-6
    )
    for wi, (x0, y0, w, h) in enumerate(info):
        xc, yc = (window - w) // 2, (window - h) // 2
        ix1 = np.maximum(boxes[:, 0], x0)
        iy1 = np.maximum(boxes[:, 1], y0)
        ix2 = np.minimum(boxes[:, 2], x0 + w)
        iy2 = np.minimum(boxes[:, 3], y0 + h)
        inter = np.maximum(ix2 - ix1, 0) * np.maximum(iy2 - iy1, 0)
        keep = np.flatnonzero(inter / area >= min_overlap)[:max_boxes]
        for j, bi in enumerate(keep):
            gt[wi, j] = [
                (np.clip(boxes[bi, 0] - x0, 0, w) + xc) / window,
                (np.clip(boxes[bi, 1] - y0, 0, h) + yc) / window,
                (np.clip(boxes[bi, 2] - x0, 0, w) + xc) / window,
                (np.clip(boxes[bi, 3] - y0, 0, h) + yc) / window,
            ]
            valid[wi, j] = True
    return gt, valid


class GTDBDetectionDataset:
    """Page-image + .pmath directory -> (window, gt, valid) samples."""

    def __init__(
        self,
        image_dir: str,
        anno_dir: str,
        window: int = 512,
        stride: tuple[int, int] = (128, 128),
        positive_only: bool = True,
    ):
        from PIL import Image

        self.samples: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []
        for fname in sorted(os.listdir(image_dir)):
            stem, ext = os.path.splitext(fname)
            if ext.lower() not in (".png", ".jpg", ".jpeg"):
                continue
            anno = os.path.join(anno_dir, stem + ".pmath")
            if not os.path.exists(anno):
                continue
            page = np.asarray(
                Image.open(os.path.join(image_dir, fname)).convert("L"), np.uint8
            )
            boxes = read_pmath(anno)
            windows, info = rolling_windows(page, stride, window)
            gt, valid = window_targets(boxes, info, window)
            for i in range(len(windows)):
                if positive_only and not valid[i].any():
                    continue
                self.samples.append((windows[i], gt[i], valid[i]))

    def __len__(self) -> int:
        return len(self.samples)

    def batches(self, batch_size: int, seed: int = 0):
        rng = np.random.default_rng(seed)
        order = rng.permutation(len(self.samples))
        for s in range(0, len(order), batch_size):
            idx = order[s : s + batch_size]
            if len(idx) < batch_size:
                continue
            imgs = np.stack([self.samples[i][0] for i in idx])
            gt = np.stack([self.samples[i][1] for i in idx])
            valid = np.stack([self.samples[i][2] for i in idx])
            yield imgs, gt, valid


def make_detection_train_step(model, priors, tx, use_focal: bool = False):
    """Jitted SSD train step (reference ``demo/ScanSSD/train.py`` loop):
    forward + (multibox | focal) loss + update, one XLA program."""
    import jax
    import jax.numpy as jnp
    import optax

    from .loss import focal_loss, multibox_loss
    from .priors import MATH_GTDB_512

    loss_fn_impl = focal_loss if use_focal else multibox_loss
    mean_pix = jnp.asarray(MATH_GTDB_512["mean_pixel"], jnp.float32)
    # priors ride as a runtime ARG, not a closed-over constant: embedding
    # the (24k, 4) table as an HLO constant bloats the serialized module
    # ~8x (3.3MB vs 0.39MB measured), past the remote-compile service's
    # request-size limit on the tunneled device (HTTP 413)
    priors_arg = jnp.asarray(priors)

    def step_impl(params, opt_state, priors_in, images, gt, valid):
        x = images.astype(jnp.float32)
        if x.shape[-1] == 1:
            x = jnp.repeat(x, 3, axis=-1)
        x = x - mean_pix

        def loss_fn(p):
            loc, conf = model.apply({"params": p}, x)
            ll, lc = loss_fn_impl(loc, conf, gt, valid, priors_in)
            return ll + lc, (ll, lc)

        (loss, (ll, lc)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss, "loss_loc": ll, "loss_conf": lc}

    jitted = jax.jit(step_impl, donate_argnums=(0, 1))

    def step(params, opt_state, images, gt, valid):
        return jitted(params, opt_state, priors_arg, images, gt, valid)

    return step
