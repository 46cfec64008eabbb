"""MultiBox training loss with hard-negative mining.

Parity target: reference ``MultiBoxLoss``
(``demo/ScanSSD/layers/modules/multibox_loss.py``): match priors to ground
truth by IoU (threshold 0.5), encode regression targets with variances,
smooth-L1 localization loss on positives, cross-entropy confidence loss
with 3:1 hard-negative mining, normalized by the positive count.

TPU-native: matching + mining are vectorized (top_k over sorted losses)
inside the jitted train step — no per-image Python loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def encode_boxes(matched, priors, variances=(0.1, 0.2)):
    """Corner-form gt (N, 4) + priors (N, 4) cxcywh -> loc targets."""
    g_cxy = (matched[:, :2] + matched[:, 2:]) / 2 - priors[:, :2]
    g_cxy = g_cxy / (variances[0] * priors[:, 2:])
    g_wh = (matched[:, 2:] - matched[:, :2]) / priors[:, 2:]
    g_wh = jnp.log(jnp.maximum(g_wh, 1e-8)) / variances[1]
    return jnp.concatenate([g_cxy, g_wh], 1)


def _point_form(priors):
    return jnp.concatenate(
        [priors[:, :2] - priors[:, 2:] / 2, priors[:, :2] + priors[:, 2:] / 2], 1
    )


def _jaccard(a, b):
    """a (N, 4), b (M, 4) corner form -> IoU (N, M)."""
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    return inter / jnp.maximum(area_a[:, None] + area_b[None, :] - inter, 1e-9)


def match_priors(gt_boxes, gt_valid, priors, iou_thresh: float = 0.5):
    """Assign each prior its best gt (reference match(), box_utils.py).

    gt_boxes (M, 4) corner form padded, gt_valid (M,) bool.
    Returns (loc_targets (N, 4), pos_mask (N,)).
    """
    pp = _point_form(priors)
    iou = _jaccard(pp, gt_boxes)  # (N, M)
    iou = jnp.where(gt_valid[None, :], iou, -1.0)

    best_gt_iou = iou.max(axis=1)
    best_gt_idx = iou.argmax(axis=1)
    # force each gt's best prior to be positive (reference index_fill)
    best_prior_idx = jnp.where(gt_valid, iou.argmax(axis=0), -1)
    forced = jnp.zeros(priors.shape[0], bool)
    forced = forced.at[jnp.where(gt_valid, best_prior_idx, 0)].set(gt_valid)
    best_gt_idx = jnp.where(
        forced,
        jnp.argmax(
            jnp.where(
                (jnp.arange(priors.shape[0])[:, None] ==
                 jnp.where(gt_valid, best_prior_idx, -2)[None, :]),
                1.0, 0.0,
            ), axis=1,
        ),
        best_gt_idx,
    )
    pos = (best_gt_iou >= iou_thresh) | forced
    matched = gt_boxes[best_gt_idx]
    return encode_boxes(matched, priors), pos


def multibox_loss(
    loc_pred, conf_pred, gt_boxes, gt_valid, priors,
    neg_pos_ratio: float = 3.0,
):
    """Batched SSD loss.  loc_pred (B, N, 4), conf_pred (B, N, C),
    gt_boxes (B, M, 4), gt_valid (B, M).  Returns (loss_l, loss_c)."""

    def one(lp, cp, gb, gv):
        loc_t, pos = match_priors(gb, gv, priors)
        n_pos = jnp.maximum(pos.sum(), 1)

        # smooth-L1 on positives
        diff = jnp.abs(lp - loc_t)
        sl1 = jnp.where(diff < 1.0, 0.5 * diff * diff, diff - 0.5).sum(-1)
        loss_l = jnp.where(pos, sl1, 0.0).sum() / n_pos

        # CE with hard-negative mining (3:1)
        logp = jax.nn.log_softmax(cp.astype(jnp.float32), -1)
        labels = pos.astype(jnp.int32)  # math class = 1
        ce = -jnp.take_along_axis(logp, labels[:, None], -1)[:, 0]
        neg_ce = jnp.where(pos, -jnp.inf, ce)
        n_neg = jnp.minimum(
            (neg_pos_ratio * n_pos).astype(jnp.int32), pos.shape[0] - 1
        )
        sorted_neg = jnp.sort(neg_ce)[::-1]
        thresh = sorted_neg[jnp.maximum(n_neg - 1, 0)]
        neg = (~pos) & (ce >= thresh) & jnp.isfinite(ce)
        loss_c = jnp.where(pos | neg, ce, 0.0).sum() / n_pos
        return loss_l, loss_c

    ll, lc = jax.vmap(one)(loc_pred, conf_pred, gt_boxes, gt_valid)
    return ll.mean(), lc.mean()


def focal_loss(
    loc_pred, conf_pred, gt_boxes, gt_valid, priors,
    alpha: float = 0.25, gamma: float = 2.0,
):
    """Focal-loss alternative to hard-negative mining (reference
    ``demo/ScanSSD/layers/modules/focal_loss.py``): smooth-L1 on positives
    + focal CE over ALL priors (no mining needed).  Returns (loss_l, loss_c).
    """

    def one(lp, cp, gb, gv):
        loc_t, pos = match_priors(gb, gv, priors)
        n_pos = jnp.maximum(pos.sum(), 1)

        diff = jnp.abs(lp - loc_t)
        sl1 = jnp.where(diff < 1.0, 0.5 * diff * diff, diff - 0.5).sum(-1)
        loss_l = jnp.where(pos, sl1, 0.0).sum() / n_pos

        logp = jax.nn.log_softmax(cp.astype(jnp.float32), -1)
        labels = pos.astype(jnp.int32)
        ce = -jnp.take_along_axis(logp, labels[:, None], -1)[:, 0]
        pt = jnp.exp(-ce)
        a_t = jnp.where(pos, alpha, 1.0 - alpha)
        fl = a_t * (1.0 - pt) ** gamma * ce
        loss_c = fl.sum() / n_pos
        return loss_l, loss_c

    ll, lc = jax.vmap(one)(loc_pred, conf_pred, gt_boxes, gt_valid)
    return ll.mean(), lc.mean()
