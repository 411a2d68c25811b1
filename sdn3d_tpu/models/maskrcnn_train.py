"""Mask R-CNN training-time layers: target assignment + losses.

Re-expression of geometric/maskrcnn/model.py:1004-1151 (losses),
:545-730 (detection_target_layer) and :1214-1324 (build_rpn_targets, host
side).  All device code is fixed-shape: the reference's nonzero/compaction
sampling becomes masked top-k selection with validity masks.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sdn3d_tpu.models.maskrcnn import MaskRCNNConfig
from sdn3d_tpu.ops.roi_align import crop_and_resize


# ---------------------------------------------------------------------------
# Host-side RPN target assignment (model.py:1214-1324)
# ---------------------------------------------------------------------------

def build_rpn_targets(anchors: np.ndarray, gt_boxes: np.ndarray,
                      config: MaskRCNNConfig,
                      rng: "np.random.RandomState" = None
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """anchors [A, 4], gt_boxes [G, 4] pixel coords ->
    (rpn_match [A] in {-1, 0, 1}, rpn_bbox [train_anchors, 4] deltas).

    `rng` makes the pos/neg anchor balance sampling reproducible
    (defaults to the global np.random, the reference's behavior)."""
    rng = rng or np.random
    rpn_match = np.zeros((anchors.shape[0],), np.int32)
    rpn_bbox = np.zeros((config.rpn_train_anchors_per_image, 4), np.float32)
    if len(gt_boxes) == 0:
        rpn_match[:] = -1
        neg = np.where(rpn_match == -1)[0]
        keep = rng.choice(
            neg, min(len(neg), config.rpn_train_anchors_per_image),
            replace=False)
        rpn_match[:] = 0
        rpn_match[keep] = -1
        return rpn_match, rpn_bbox

    # IoU (no +1 here: model.py:1260 uses exclusive areas via utils)
    a_y1, a_x1, a_y2, a_x2 = anchors.T
    g_y1, g_x1, g_y2, g_x2 = gt_boxes.T
    a_area = (a_y2 - a_y1) * (a_x2 - a_x1)
    g_area = (g_y2 - g_y1) * (g_x2 - g_x1)
    iy1 = np.maximum(a_y1[:, None], g_y1[None])
    ix1 = np.maximum(a_x1[:, None], g_x1[None])
    iy2 = np.minimum(a_y2[:, None], g_y2[None])
    ix2 = np.minimum(a_x2[:, None], g_x2[None])
    inter = np.maximum(iy2 - iy1, 0) * np.maximum(ix2 - ix1, 0)
    overlaps = inter / (a_area[:, None] + g_area[None] - inter)

    anchor_iou_argmax = overlaps.argmax(axis=1)
    anchor_iou_max = overlaps.max(axis=1)
    rpn_match[anchor_iou_max < 0.3] = -1
    gt_iou_argmax = overlaps.argmax(axis=0)
    rpn_match[gt_iou_argmax] = 1
    rpn_match[anchor_iou_max >= 0.7] = 1

    # Balance (model.py:1285-1302)
    ids = np.where(rpn_match == 1)[0]
    extra = len(ids) - config.rpn_train_anchors_per_image // 2
    if extra > 0:
        rpn_match[rng.choice(ids, extra, replace=False)] = 0
    ids = np.where(rpn_match == -1)[0]
    extra = len(ids) - (config.rpn_train_anchors_per_image
                        - np.sum(rpn_match == 1))
    if extra > 0:
        rpn_match[rng.choice(ids, extra, replace=False)] = 0

    # Deltas for positive anchors, std-normalized (model.py:1305-1324)
    ids = np.where(rpn_match == 1)[0]
    std = np.asarray(config.rpn_bbox_std_dev)
    for ix, i in enumerate(ids[:config.rpn_train_anchors_per_image]):
        gt = gt_boxes[anchor_iou_argmax[i]]
        a = anchors[i]
        gh, gw = gt[2] - gt[0], gt[3] - gt[1]
        gcy, gcx = gt[0] + 0.5 * gh, gt[1] + 0.5 * gw
        ah, aw = a[2] - a[0], a[3] - a[1]
        acy, acx = a[0] + 0.5 * ah, a[1] + 0.5 * aw
        rpn_bbox[ix] = [(gcy - acy) / ah, (gcx - acx) / aw,
                        np.log(gh / ah), np.log(gw / aw)]
        rpn_bbox[ix] /= std
    return rpn_match, rpn_bbox


# ---------------------------------------------------------------------------
# Fixed-shape detection target layer (model.py:545-730)
# ---------------------------------------------------------------------------

def box_deltas(rois: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Refinement targets (model.py:506-542 box_refinement)."""
    h = rois[:, 2] - rois[:, 0]
    w = rois[:, 3] - rois[:, 1]
    cy = rois[:, 0] + 0.5 * h
    cx = rois[:, 1] + 0.5 * w
    gh = gt[:, 2] - gt[:, 0]
    gw = gt[:, 3] - gt[:, 1]
    gcy = gt[:, 0] + 0.5 * gh
    gcx = gt[:, 1] + 0.5 * gw
    h = jnp.maximum(h, 1e-6)
    w = jnp.maximum(w, 1e-6)
    return jnp.stack([(gcy - cy) / h, (gcx - cx) / w,
                      jnp.log(jnp.maximum(gh, 1e-6) / h),
                      jnp.log(jnp.maximum(gw, 1e-6) / w)], axis=1)


def detection_targets(
    proposals: jnp.ndarray,      # [P, 4] normalized
    prop_valid: jnp.ndarray,     # [P]
    gt_class_ids: jnp.ndarray,   # [G] (0 = pad)
    gt_boxes: jnp.ndarray,       # [G, 4] normalized
    gt_masks: jnp.ndarray,       # [G, mh, mw] (mini-masks)
    rng: jax.Array,
    config: MaskRCNNConfig,
) -> Dict[str, jnp.ndarray]:
    """Sample train_rois_per_image proposals with a ~1:2 pos:neg ratio and
    build class/delta/mask targets — fixed shapes, masked."""
    T = config.train_rois_per_image
    n_pos_max = int(T * config.roi_positive_ratio)
    gt_valid = gt_class_ids > 0

    # direct [P, G] cross-IoU (a concat self-IoU would compute the full
    # (P+G)^2 matrix to use only this block)
    py1, px1, py2, px2 = jnp.moveaxis(proposals, -1, 0)
    gy1_, gx1_, gy2_, gx2_ = jnp.moveaxis(gt_boxes, -1, 0)
    p_area = (py2 - py1) * (px2 - px1)
    g_area = (gy2_ - gy1_) * (gx2_ - gx1_)
    iy1 = jnp.maximum(py1[:, None], gy1_[None])
    ix1 = jnp.maximum(px1[:, None], gx1_[None])
    iy2 = jnp.minimum(py2[:, None], gy2_[None])
    ix2 = jnp.minimum(px2[:, None], gx2_[None])
    inter = (jnp.maximum(iy2 - iy1, 0) * jnp.maximum(ix2 - ix1, 0))
    union = p_area[:, None] + g_area[None] - inter
    overlaps = inter / jnp.maximum(union, 1e-12)           # [P, G]
    overlaps = jnp.where(gt_valid[None, :], overlaps, -1.0)
    roi_iou_max = overlaps.max(axis=1)
    best_gt = overlaps.argmax(axis=1)

    positive = (roi_iou_max >= 0.5) & prop_valid
    negative = (roi_iou_max < 0.5) & prop_valid

    kp, kn = jax.random.split(rng)
    pos_score = jnp.where(positive, jax.random.uniform(kp, positive.shape),
                          -1.0)
    _, pos_idx = jax.lax.top_k(pos_score, n_pos_max)
    pos_ok = jnp.take(positive, pos_idx)

    neg_score = jnp.where(negative, jax.random.uniform(kn, negative.shape),
                          -1.0)
    _, neg_idx = jax.lax.top_k(neg_score, T - n_pos_max)
    neg_ok = jnp.take(negative, neg_idx)

    # Maintain the reference's pos:neg ratio against the ACTUAL positive
    # count (model.py:667-671: negative_count = positives/ratio -
    # positives, and ZERO negatives when there are no positives) instead
    # of always activating all T - n_pos_max negative slots — otherwise
    # early training drives the class head toward background at up to
    # 1:27 instead of 1:2.
    n_pos = jnp.sum(pos_ok)
    neg_allowed = (jnp.floor(n_pos / config.roi_positive_ratio)
                   .astype(jnp.int32) - n_pos)
    neg_rank = jnp.cumsum(neg_ok.astype(jnp.int32)) - 1
    neg_ok = neg_ok & (neg_rank < neg_allowed)

    roi_idx = jnp.concatenate([pos_idx, neg_idx])
    is_pos = jnp.concatenate([pos_ok, jnp.zeros_like(neg_ok)])
    roi_ok = jnp.concatenate([pos_ok, neg_ok])

    rois = proposals[roi_idx]
    gt_assign = best_gt[roi_idx]
    class_ids = jnp.where(is_pos, gt_class_ids[gt_assign], 0)

    deltas = box_deltas(rois, gt_boxes[gt_assign])
    deltas = deltas / jnp.asarray(config.bbox_std_dev)
    deltas = jnp.where(is_pos[:, None], deltas, 0.0)

    # Mask targets: crop the assigned GT mask to the roi, resized to
    # mask_shape (model.py:689-718 via CropAndResize on the mini-masks).
    gt_for_roi = gt_boxes[gt_assign]                     # [T, 4]
    gy1, gx1, gy2, gx2 = jnp.moveaxis(gt_for_roi, -1, 0)
    gh = jnp.maximum(gy2 - gy1, 1e-6)
    gw = jnp.maximum(gx2 - gx1, 1e-6)
    # roi in the gt-mask's own coordinate frame
    boxes = jnp.stack([(rois[:, 0] - gy1) / gh, (rois[:, 1] - gx1) / gw,
                       (rois[:, 2] - gy1) / gh, (rois[:, 3] - gx1) / gw],
                      axis=1)
    crops = crop_and_resize(gt_masks[..., None].astype(jnp.float32),
                            boxes, gt_assign.astype(jnp.int32),
                            config.mask_shape)[..., 0]
    masks = jnp.round(crops) * is_pos[:, None, None]

    return {"rois": rois, "roi_valid": roi_ok, "class_ids": class_ids,
            "deltas": deltas, "masks": masks, "is_pos": is_pos}


# ---------------------------------------------------------------------------
# Losses (model.py:1004-1151) — masked fixed-shape versions
# ---------------------------------------------------------------------------

def smooth_l1(x: jnp.ndarray) -> jnp.ndarray:
    ax = jnp.abs(x)
    return jnp.where(ax < 1.0, 0.5 * x * x, ax - 0.5)


def rpn_class_loss(rpn_match: jnp.ndarray,
                   rpn_class_logits: jnp.ndarray) -> jnp.ndarray:
    """rpn_match [A] in {-1,0,1}; logits [A, 2]."""
    anchor_class = (rpn_match == 1).astype(jnp.int32)
    use = rpn_match != 0
    logp = jax.nn.log_softmax(rpn_class_logits, axis=-1)
    nll = -jnp.take_along_axis(logp, anchor_class[:, None], axis=1)[:, 0]
    return jnp.sum(nll * use) / jnp.maximum(jnp.sum(use), 1)


def rpn_bbox_loss(target_bbox: jnp.ndarray, rpn_match: jnp.ndarray,
                  rpn_pred: jnp.ndarray) -> jnp.ndarray:
    """target_bbox [K, 4] (packed positives); rpn_pred [A, 4]."""
    pos = rpn_match == 1
    n_pos = jnp.sum(pos)
    # pack predicted deltas of positive anchors to the front, like the
    # reference's nonzero gather (model.py:1046-1056)
    order = jnp.argsort(~pos)                # positives first, stable
    pred_packed = rpn_pred[order][:target_bbox.shape[0]]
    use = (jnp.arange(target_bbox.shape[0]) < n_pos)[:, None]
    l = smooth_l1(pred_packed - target_bbox) * use
    return jnp.sum(l) / jnp.maximum(jnp.sum(use) * 4, 1)


def mrcnn_class_loss(class_ids: jnp.ndarray, valid: jnp.ndarray,
                     logits: jnp.ndarray) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, class_ids[:, None], axis=1)[:, 0]
    return jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1)


def mrcnn_bbox_loss(target_deltas: jnp.ndarray, class_ids: jnp.ndarray,
                    is_pos: jnp.ndarray, pred: jnp.ndarray) -> jnp.ndarray:
    """pred [T, C, 4]; only positive rois' own class contributes."""
    sel = jnp.take_along_axis(
        pred, class_ids[:, None, None].astype(jnp.int32), axis=1)[:, 0]
    l = smooth_l1(sel - target_deltas) * is_pos[:, None]
    return jnp.sum(l) / jnp.maximum(jnp.sum(is_pos) * 4, 1)


def mrcnn_mask_loss(target_masks: jnp.ndarray, class_ids: jnp.ndarray,
                    is_pos: jnp.ndarray, pred_masks: jnp.ndarray
                    ) -> jnp.ndarray:
    """pred_masks [T, mh, mw, C] sigmoid outputs."""
    sel = jnp.take_along_axis(
        pred_masks, class_ids[:, None, None, None].astype(jnp.int32),
        axis=3)[..., 0]
    eps = 1e-7
    bce = -(target_masks * jnp.log(sel + eps)
            + (1 - target_masks) * jnp.log(1 - sel + eps))
    bce = bce * is_pos[:, None, None]
    denom = jnp.maximum(jnp.sum(is_pos) * np.prod(target_masks.shape[1:]), 1)
    return jnp.sum(bce) / denom
