"""Box decode + on-device NMS for the math detector.

Parity targets:
- decode with variances [0.1, 0.2]: reference ``demo/ScanSSD/layers/
  box_utils.py`` decode()
- test-phase Detect + per-page torchvision ``nms`` at IoU 0.1
  (``demo/ScanSSD/ssd.py:73-76``, ``demo/app.py:152``)

TPU-native: NMS is a fixed-iteration ``lax.fori_loop`` over the top-K
scoring boxes (static shapes, fully on device) instead of a dynamic CPU
loop; suppressed entries get score 0 so callers threshold once at the end.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def decode_boxes(loc, priors, variances=(0.1, 0.2)):
    """loc (..., N, 4) offsets + priors (N, 4) cxcywh -> (..., N, 4)
    corner-form (x1, y1, x2, y2), normalized."""
    pxy, pwh = priors[..., :2], priors[..., 2:]
    cxy = pxy + loc[..., :2] * variances[0] * pwh
    wh = pwh * jnp.exp(loc[..., 2:] * variances[1])
    return jnp.concatenate([cxy - wh / 2, cxy + wh / 2], axis=-1)


def _iou_matrix(boxes):
    """(K, 4) corner boxes -> (K, K) IoU."""
    area = jnp.maximum(boxes[:, 2] - boxes[:, 0], 0) * jnp.maximum(
        boxes[:, 3] - boxes[:, 1], 0
    )
    lt = jnp.maximum(boxes[:, None, :2], boxes[None, :, :2])
    rb = jnp.minimum(boxes[:, None, 2:], boxes[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area[:, None] + area[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


def nms_fixed(boxes, scores, iou_thresh: float = 0.1, top_k: int = 200):
    """Greedy NMS over the top_k boxes, fully on device.

    Returns (boxes (top_k, 4), scores (top_k,)) where suppressed/unused
    entries have score 0.  Equivalent to torchvision.ops.nms followed by
    truncation to top_k.
    """
    k = min(top_k, scores.shape[0])
    top_scores, idx = jax.lax.top_k(scores, k)
    top_boxes = boxes[idx]
    iou = _iou_matrix(top_boxes)

    def body(i, keep):
        alive = keep[i] > 0
        # suppress lower-scored boxes overlapping box i
        suppress = (iou[i] > iou_thresh) & (
            jnp.arange(k) > i
        ) & alive
        return jnp.where(suppress, 0.0, keep)

    keep = jax.lax.fori_loop(0, k, body, jnp.where(top_scores > 0, 1.0, 0.0))
    return top_boxes, top_scores * keep


def batched_detect(
    loc, conf, priors, cls: int = 1, conf_thresh: float = 0.5,
    iou_thresh: float = 0.1, top_k: int = 200,
):
    """Full test-phase detect for a batch of windows.

    loc (B, N, 4), conf (B, N, C) logits -> (boxes (B, top_k, 4),
    scores (B, top_k)); scores already thresholded (0 below conf_thresh).
    """
    probs = jax.nn.softmax(conf.astype(jnp.float32), axis=-1)[..., cls]
    decoded = decode_boxes(loc, priors)

    def one(b, s):
        s = jnp.where(s >= conf_thresh, s, 0.0)
        return nms_fixed(b, s, iou_thresh, top_k)

    return jax.vmap(one)(decoded, probs)
