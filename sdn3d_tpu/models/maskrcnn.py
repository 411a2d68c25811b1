"""Mask R-CNN (FPN + RPN + heads) — fixed-shape TPU inference/training graph.

Re-expression of geometric/maskrcnn/model.py (2.2 kLoC torch port of
multimask-rcnn).  Key structural changes for XLA:

  * proposal_layer (model.py:344-407) and refine_detections (:744-838) use
    dynamic nonzero/compaction + CUDA NMS; here every stage is fixed-shape
    with validity masks (top-k via lax.top_k, NMS via ops.nms).
  * pyramid_roi_align (:414-502) loops over pyramid levels with boolean
    compaction; here all boxes are cropped against every level and selected
    with a where — static shapes, 4x redundant crop FLOPs, no host sync.
  * This backbone variant is NOT torchvision: stride sits on the 1x1 conv1
    of each bottleneck, padding is TF-"SAME" (SamePad2d), BN eps=1e-3
    momentum=0.01, convs have biases (model.py:210-305).

Images are NHWC float (mean-subtracted, MEAN_PIXEL config.py:104).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from sdn3d_tpu.ops.nms import nms_padded
from sdn3d_tpu.ops.roi_align import crop_and_resize


# ---------------------------------------------------------------------------
# Config (geometric/maskrcnn/config.py:19-183 + vkitti.py:30-41)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class MaskRCNNConfig:
    name: str = "vkitti"
    num_classes: int = 3                 # BG + car + van (vkitti.py:36)
    backbone_strides: Tuple[int, ...] = (4, 8, 16, 32, 64)
    rpn_anchor_scales: Tuple[int, ...] = (32, 64, 128, 256, 512)
    rpn_anchor_ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    rpn_anchor_stride: int = 1
    rpn_nms_threshold: float = 0.7
    rpn_train_anchors_per_image: int = 256
    pre_nms_limit: int = 6000
    post_nms_rois_training: int = 2000
    post_nms_rois_inference: int = 1000
    image_min_dim: int = 300             # vkitti.py IMAGE_MIN_DIM
    image_max_dim: int = 1024
    mean_pixel: Tuple[float, float, float] = (123.7, 116.8, 103.9)
    train_rois_per_image: int = 200
    roi_positive_ratio: float = 0.33
    pool_size: int = 7
    mask_pool_size: int = 14
    mask_shape: Tuple[int, int] = (28, 28)
    max_gt_instances: int = 100
    rpn_bbox_std_dev: Tuple[float, ...] = (0.1, 0.1, 0.2, 0.2)
    bbox_std_dev: Tuple[float, ...] = (0.1, 0.1, 0.2, 0.2)
    detection_max_instances: int = 100
    detection_min_confidence: float = 0.7
    detection_nms_threshold: float = 0.3
    fpn_channels: int = 256
    # resnet101 for vkitti (model.py:1445 default "resnet101")
    stage_sizes: Tuple[int, ...] = (3, 4, 23, 3)
    # computation dtype name for convs/dense ("bfloat16" runs the conv
    # stacks ~5x faster on v5e; params, BN stats, box math stay float32)
    compute_dtype: str = "float32"

    def __post_init__(self):
        # config.py:181-183: "Image size must be dividable by 2 at least
        # 6 times" — otherwise the FPN top-down adds mismatched shapes
        # and XLA raises an opaque broadcast error.
        assert self.image_max_dim % 64 == 0, (
            f"image_max_dim must be a multiple of 64, got "
            f"{self.image_max_dim}")

    @property
    def image_shape(self) -> Tuple[int, int, int]:
        return (self.image_max_dim, self.image_max_dim, 3)

    @property
    def backbone_shapes(self) -> np.ndarray:
        h, w = self.image_shape[:2]
        return np.array([[int(np.ceil(h / s)), int(np.ceil(w / s))]
                         for s in self.backbone_strides])


# ---------------------------------------------------------------------------
# Anchors (maskrcnn/utils.py:399-458) — host-side numpy, computed once
# ---------------------------------------------------------------------------

def generate_anchors(scales, ratios, shape, feature_stride, anchor_stride
                     ) -> np.ndarray:
    scales, ratios = np.meshgrid(np.array(scales), np.array(ratios))
    scales, ratios = scales.flatten(), ratios.flatten()
    heights = scales / np.sqrt(ratios)
    widths = scales * np.sqrt(ratios)
    shifts_y = np.arange(0, shape[0], anchor_stride) * feature_stride
    shifts_x = np.arange(0, shape[1], anchor_stride) * feature_stride
    shifts_x, shifts_y = np.meshgrid(shifts_x, shifts_y)
    box_widths, box_centers_x = np.meshgrid(widths, shifts_x)
    box_heights, box_centers_y = np.meshgrid(heights, shifts_y)
    box_centers = np.stack([box_centers_y, box_centers_x], 2).reshape(-1, 2)
    box_sizes = np.stack([box_heights, box_widths], 2).reshape(-1, 2)
    return np.concatenate([box_centers - 0.5 * box_sizes,
                           box_centers + 0.5 * box_sizes], 1)


def generate_pyramid_anchors(config: MaskRCNNConfig) -> np.ndarray:
    anchors = [
        generate_anchors(config.rpn_anchor_scales[i],
                         config.rpn_anchor_ratios,
                         config.backbone_shapes[i],
                         config.backbone_strides[i],
                         config.rpn_anchor_stride)
        for i in range(len(config.rpn_anchor_scales))
    ]
    return np.concatenate(anchors, 0).astype(np.float32)


# ---------------------------------------------------------------------------
# Box math (model.py:307-341)
# ---------------------------------------------------------------------------

def apply_box_deltas(boxes: jnp.ndarray, deltas: jnp.ndarray) -> jnp.ndarray:
    height = boxes[:, 2] - boxes[:, 0]
    width = boxes[:, 3] - boxes[:, 1]
    center_y = boxes[:, 0] + 0.5 * height + deltas[:, 0] * height
    center_x = boxes[:, 1] + 0.5 * width + deltas[:, 1] * width
    height = height * jnp.exp(deltas[:, 2])
    width = width * jnp.exp(deltas[:, 3])
    y1 = center_y - 0.5 * height
    x1 = center_x - 0.5 * width
    return jnp.stack([y1, x1, y1 + height, x1 + width], axis=1)


def clip_boxes(boxes: jnp.ndarray, window) -> jnp.ndarray:
    y1, x1, y2, x2 = window
    return jnp.stack([
        jnp.clip(boxes[:, 0], y1, y2),
        jnp.clip(boxes[:, 1], x1, x2),
        jnp.clip(boxes[:, 2], y1, y2),
        jnp.clip(boxes[:, 3], x1, x2)], axis=1)


# ---------------------------------------------------------------------------
# Backbone + FPN (model.py:148-305)
# ---------------------------------------------------------------------------

class MRBottleneck(nn.Module):
    """Caffe-style bottleneck: stride on conv1 (model.py:210-247)."""
    planes: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.99, epsilon=1e-3,
            dtype=jnp.float32, name=name)
        residual = x
        y = nn.Conv(self.planes, (1, 1), strides=(self.stride,) * 2,
                    dtype=self.dtype, name="conv1")(x)
        y = nn.relu(norm("bn1")(y))
        y = nn.Conv(self.planes, (3, 3), padding="SAME", dtype=self.dtype, name="conv2")(y)
        y = nn.relu(norm("bn2")(y))
        y = nn.Conv(self.planes * 4, (1, 1), dtype=self.dtype, name="conv3")(y)
        y = norm("bn3")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.planes * 4, (1, 1),
                               strides=(self.stride,) * 2,
                               dtype=self.dtype, name="downsample_conv")(x)
            residual = norm("downsample_bn")(residual)
        return nn.relu(y + residual)


class MRResNet(nn.Module):
    """resnet101 bottom-up returning (C1..C5) (model.py:249-305)."""
    stage_sizes: Sequence[int] = (3, 4, 23, 3)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, dtype=jnp.float32, name="bn1")(x)
        x = nn.relu(x)
        c1 = x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        outs = [c1]
        for i, (blocks, planes) in enumerate(
                zip(self.stage_sizes, (64, 128, 256, 512))):
            stride = 1 if i == 0 else 2
            for j in range(blocks):
                x = MRBottleneck(planes, stride if j == 0 else 1,
                                 dtype=self.dtype,
                                 name=f"C{i + 2}_{j}")(x, train=train)
            outs.append(x)
        return tuple(outs)


class FPN(nn.Module):
    """Top-down pyramid P2..P6 (model.py:148-203)."""
    out_channels: int = 256
    stage_sizes: Sequence[int] = (3, 4, 23, 3)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        _, c2, c3, c4, c5 = MRResNet(self.stage_sizes, dtype=self.dtype,
                                     name="resnet")(x, train=train)

        def up2(t):
            return jnp.repeat(jnp.repeat(t, 2, axis=1), 2, axis=2)

        p5 = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="P5_conv1")(c5)
        p4 = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="P4_conv1")(c4) + up2(p5)
        p3 = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="P3_conv1")(c3) + up2(p4)
        p2 = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="P2_conv1")(c2) + up2(p3)

        p5 = nn.Conv(self.out_channels, (3, 3), padding="SAME",
                     dtype=self.dtype, name="P5_conv2")(p5)
        p4 = nn.Conv(self.out_channels, (3, 3), padding="SAME",
                     dtype=self.dtype, name="P4_conv2")(p4)
        p3 = nn.Conv(self.out_channels, (3, 3), padding="SAME",
                     dtype=self.dtype, name="P3_conv2")(p3)
        p2 = nn.Conv(self.out_channels, (3, 3), padding="SAME",
                     dtype=self.dtype, name="P2_conv2")(p2)
        # P6: stride-2 subsample of P5 (MaxPool2d(kernel=1, stride=2)).
        p6 = p5[:, ::2, ::2, :]
        return [p2, p3, p4, p5, p6]


class RPNHead(nn.Module):
    """Shared RPN head (model.py:862-913)."""
    anchors_per_location: int = 3
    anchor_stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = (self.anchor_stride,) * 2
        shared = nn.relu(nn.Conv(512, (3, 3), strides=s, padding="SAME",
                                 dtype=self.dtype, name="conv_shared")(x))
        logits = nn.Conv(2 * self.anchors_per_location, (1, 1),
                         dtype=self.dtype, name="conv_class")(shared)
        logits = logits.reshape(x.shape[0], -1, 2).astype(jnp.float32)
        probs = jax.nn.softmax(logits, axis=2)
        bbox = nn.Conv(4 * self.anchors_per_location, (1, 1),
                       dtype=self.dtype, name="conv_bbox")(shared)
        bbox = bbox.reshape(x.shape[0], -1, 4).astype(jnp.float32)
        return logits, probs, bbox


# ---------------------------------------------------------------------------
# Proposal layer (model.py:344-407) — fixed shapes
# ---------------------------------------------------------------------------

def proposal_layer(rpn_probs: jnp.ndarray, rpn_bbox: jnp.ndarray,
                   anchors: jnp.ndarray, config: MaskRCNNConfig,
                   proposal_count: int
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """rpn_probs [A, 2], rpn_bbox [A, 4], anchors [A, 4] (pixel coords).
    Returns (proposals [proposal_count, 4] normalized, valid mask)."""
    scores = rpn_probs[:, 1]
    deltas = rpn_bbox * jnp.asarray(config.rpn_bbox_std_dev)

    pre = min(config.pre_nms_limit, anchors.shape[0])
    top_scores, order = jax.lax.top_k(scores, pre)
    top_deltas = deltas[order]
    top_anchors = anchors[order]

    boxes = apply_box_deltas(top_anchors, top_deltas)
    h, w = config.image_shape[:2]
    boxes = clip_boxes(boxes, (0.0, 0.0, float(h), float(w)))

    keep_idx, keep_valid = nms_padded(boxes, top_scores,
                                      config.rpn_nms_threshold,
                                      proposal_count)
    props = boxes[keep_idx] / jnp.asarray([h, w, h, w], jnp.float32)
    props = props * keep_valid[:, None]
    return props, keep_valid


# ---------------------------------------------------------------------------
# Pyramid ROI align (model.py:414-502) — fixed shapes
# ---------------------------------------------------------------------------

def pyramid_roi_align(boxes: jnp.ndarray, feature_maps: List[jnp.ndarray],
                      pool_size: int, image_shape: Tuple[int, int, int]
                      ) -> jnp.ndarray:
    """boxes [N, 4] normalized; feature_maps [P2..P5] each [1, h, w, C].
    Returns [N, pool, pool, C]."""
    y1, x1, y2, x2 = jnp.moveaxis(boxes, -1, 0)
    h = y2 - y1
    w = x2 - x1
    image_area = float(image_shape[0] * image_shape[1])
    roi_level = 4 + jnp.log2(jnp.sqrt(jnp.maximum(h * w, 1e-12))
                             / (224.0 / np.sqrt(image_area)))
    roi_level = jnp.clip(jnp.round(roi_level), 2, 5).astype(jnp.int32)

    boxes = jax.lax.stop_gradient(boxes)
    n = boxes.shape[0]
    out = None
    for i, level in enumerate(range(2, 6)):
        crops = crop_and_resize(feature_maps[i], boxes,
                                jnp.zeros((n,), jnp.int32),
                                (pool_size, pool_size))
        sel = (roi_level == level)[:, None, None, None]
        out = crops * sel if out is None else out + crops * sel
    return out


# ---------------------------------------------------------------------------
# Heads (model.py:920-997)
# ---------------------------------------------------------------------------

class Classifier(nn.Module):
    pool_size: int = 7
    num_classes: int = 3
    image_shape: Tuple[int, int, int] = (1024, 1024, 3)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feature_maps, rois, train: bool = False):
        x = pyramid_roi_align(rois, feature_maps, self.pool_size,
                              self.image_shape)
        norm = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.99, epsilon=1e-3,
            dtype=jnp.float32, name=name)
        x = nn.Conv(1024, (self.pool_size,) * 2, padding="VALID",
                    dtype=self.dtype, name="conv1")(x)
        x = nn.relu(norm("bn1")(x))
        x = nn.Conv(1024, (1, 1), dtype=self.dtype, name="conv2")(x)
        x = nn.relu(norm("bn2")(x))
        x = x.reshape(-1, 1024)
        logits = nn.Dense(self.num_classes, dtype=self.dtype,
                          name="linear_class")(x).astype(jnp.float32)
        probs = jax.nn.softmax(logits, axis=1)
        bbox = nn.Dense(self.num_classes * 4, dtype=self.dtype, name="linear_bbox")(x)
        bbox = bbox.reshape(-1, self.num_classes, 4).astype(jnp.float32)
        return logits, probs, bbox


class MaskHead(nn.Module):
    pool_size: int = 14
    num_classes: int = 3
    image_shape: Tuple[int, int, int] = (1024, 1024, 3)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feature_maps, rois, train: bool = False):
        x = pyramid_roi_align(rois, feature_maps, self.pool_size,
                              self.image_shape)
        norm = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.99, epsilon=1e-3,
            dtype=jnp.float32, name=name)
        for k in range(1, 5):
            x = nn.Conv(256, (3, 3), padding="SAME", dtype=self.dtype, name=f"conv{k}")(x)
            x = nn.relu(norm(f"bn{k}")(x))
        # transpose_kernel=True: torch ConvTranspose2d semantics, matching
        # the port's [I, O, kh, kw] -> [kh, kw, O, I] conversion (caught by
        # test_maskrcnn_full_detect_parity — without it the ported deconv
        # weights are spatially flipped with I/O swapped).
        x = nn.ConvTranspose(256, (2, 2), strides=(2, 2),
                             transpose_kernel=True, dtype=self.dtype,
                             name="deconv")(x)
        x = nn.relu(x)
        x = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                    name="conv5")(x)
        return jax.nn.sigmoid(x.astype(jnp.float32))


# ---------------------------------------------------------------------------
# Detection refinement (model.py:744-838) — fixed shapes
# ---------------------------------------------------------------------------

def refine_detections(rois: jnp.ndarray, probs: jnp.ndarray,
                      deltas: jnp.ndarray, window, roi_valid: jnp.ndarray,
                      config: MaskRCNNConfig
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """rois [N,4] normalized, probs [N,C], deltas [N,C,4].
    Returns (detections [max_det, 6] = (y1,x1,y2,x2,class_id,score) in
    pixels, valid [max_det])."""
    N, C = probs.shape
    class_ids = jnp.argmax(probs, axis=1)
    idx = jnp.arange(N)
    class_scores = probs[idx, class_ids]
    deltas_specific = deltas[idx, class_ids]

    # reference quirk kept: refine_detections scales head deltas by
    # RPN_BBOX_STD_DEV, not BBOX_STD_DEV (model.py:772) — identical values
    # by default, but the faithful choice if configured apart.
    std = jnp.asarray(config.rpn_bbox_std_dev)
    refined = apply_box_deltas(rois, deltas_specific * std)
    h, w = config.image_shape[:2]
    refined = refined * jnp.asarray([h, w, h, w], jnp.float32)
    refined = clip_boxes(refined, (window[0], window[1], window[2], window[3]))
    refined = jnp.round(refined)

    keep = (class_ids > 0) & roi_valid
    if config.detection_min_confidence:
        keep = keep & (class_scores >= config.detection_min_confidence)

    # Per-class NMS over static class loop (C is small: 3 for vkitti).
    nms_keep = jnp.zeros((N,), bool)
    for c in range(1, C):
        in_class = keep & (class_ids == c)
        scores_c = jnp.where(in_class, class_scores, -1.0)
        kidx, kvalid = nms_padded(refined, scores_c,
                                  config.detection_nms_threshold,
                                  min(config.detection_max_instances, N),
                                  valid=in_class)
        hits = jnp.zeros((N,), bool).at[kidx].max(kvalid, mode="drop")
        nms_keep = nms_keep | (hits & in_class)
    keep = keep & nms_keep

    # Top detection_max_instances by score.
    masked_scores = jnp.where(keep, class_scores, -jnp.inf)
    top_scores, top_idx = jax.lax.top_k(masked_scores,
                                        config.detection_max_instances)
    valid = jnp.isfinite(top_scores)
    dets = jnp.concatenate([
        refined[top_idx],
        class_ids[top_idx, None].astype(jnp.float32),
        class_scores[top_idx, None]], axis=1)
    dets = dets * valid[:, None]
    return dets, valid


# ---------------------------------------------------------------------------
# Full model
# ---------------------------------------------------------------------------

class MaskRCNN(nn.Module):
    """Inference graph (model.py:1705-1781 'inference' mode), batch size 1
    (the reference's own limit, model.py:358)."""

    config: MaskRCNNConfig = MaskRCNNConfig()

    def setup(self):
        cfg = self.config
        dt = jnp.dtype(cfg.compute_dtype)
        self.fpn = FPN(cfg.fpn_channels, cfg.stage_sizes, dtype=dt)
        self.rpn = RPNHead(len(cfg.rpn_anchor_ratios), cfg.rpn_anchor_stride,
                           dtype=dt)
        self.classifier = Classifier(cfg.pool_size, cfg.num_classes,
                                     cfg.image_shape, dtype=dt)
        self.mask = MaskHead(cfg.mask_pool_size, cfg.num_classes,
                             cfg.image_shape, dtype=dt)

    def __call__(self, images: jnp.ndarray, anchors: jnp.ndarray,
                 window: Tuple[float, float, float, float],
                 train: bool = False) -> Dict[str, jnp.ndarray]:
        """images [1, H, W, 3] mean-subtracted; anchors [A, 4] pixel coords.

        Returns dict with detections [D, 6], det_valid [D], masks
        [D, mh, mw, num_classes] (per-roi sigmoid masks; class selection +
        unmolding happens host-side as in model.py:2084-2128)."""
        cfg = self.config
        pyramid = self.fpn(images, train=train)
        rpn_feature_maps = pyramid                      # P2..P6
        mrcnn_feature_maps = pyramid[:4]                # P2..P5

        rpn_class_logits, rpn_probs, rpn_bbox = self._rpn_forward(
            rpn_feature_maps)

        proposals, prop_valid = proposal_layer(
            rpn_probs[0], rpn_bbox[0], anchors, cfg,
            cfg.post_nms_rois_inference)

        _, mrcnn_probs, mrcnn_bbox = self.classifier(
            mrcnn_feature_maps, proposals, train=train)

        detections, det_valid = refine_detections(
            proposals, mrcnn_probs, mrcnn_bbox, window, prop_valid, cfg)

        # Mask head on the final detection boxes (normalized again).
        h, w = cfg.image_shape[:2]
        det_boxes = detections[:, :4] / jnp.asarray([h, w, h, w], jnp.float32)
        masks = self.mask(mrcnn_feature_maps, det_boxes, train=train)

        return {
            "rpn_class_logits": rpn_class_logits,
            "rpn_bbox": rpn_bbox,
            "proposals": proposals,
            "proposal_valid": prop_valid,
            "detections": detections,
            "det_valid": det_valid,
            "masks": masks,
        }

    def _rpn_forward(self, feature_maps):
        """Shared per-level RPN apply + anchor-axis concat
        (model.py:1731-1745) for the inference and training graphs."""
        logits_l, probs_l, bbox_l = [], [], []
        for p in feature_maps:
            lg, pb, bb = self.rpn(p)
            logits_l.append(lg)
            probs_l.append(pb)
            bbox_l.append(bb)
        return (jnp.concatenate(logits_l, axis=1),
                jnp.concatenate(probs_l, axis=1),
                jnp.concatenate(bbox_l, axis=1))

    def train_forward(self, images: jnp.ndarray, anchors: jnp.ndarray,
                      gt_class_ids: jnp.ndarray, gt_boxes: jnp.ndarray,
                      gt_masks: jnp.ndarray, rng: jax.Array,
                      train_bn: bool = False) -> Dict[str, jnp.ndarray]:
        """Training graph (model.py:1783-1821 'training' mode): proposals ->
        detection-target sampling -> heads on the sampled rois.

        gt_boxes are NORMALIZED (y1,x1,y2,x2); gt_class_ids 0-padded;
        gt_masks [G, mh, mw] mini-masks."""
        from sdn3d_tpu.models.maskrcnn_train import detection_targets

        cfg = self.config
        # Default train_bn=False: BatchNorm stays in EVAL mode during
        # training — running stats are used and never updated
        # (model.py:1714-1720 set_bn_eval; batch size 1 makes batch
        # statistics useless).  That parity choice assumes COCO-ported
        # running stats that already normalize the ±128-scale
        # mean-subtracted inputs; FROM RANDOM INIT eval-mode BN is
        # identity and activations blow up (measured: init RPN NLL ~216
        # → NaN within 10 steps at any LR).  train_bn=True enables
        # normal BN training (batch stats mutable) for from-scratch
        # runs — the reference has no from-scratch story at all (it
        # always transfers from COCO).  There is no dropout either way.
        pyramid = self.fpn(images, train=train_bn)
        mrcnn_feature_maps = pyramid[:4]

        rpn_class_logits, rpn_probs, rpn_bbox = self._rpn_forward(pyramid)

        proposals, prop_valid = proposal_layer(
            jax.lax.stop_gradient(rpn_probs[0]),
            jax.lax.stop_gradient(rpn_bbox[0]),
            anchors, cfg, cfg.post_nms_rois_training)

        tgt = detection_targets(proposals, prop_valid, gt_class_ids,
                                gt_boxes, gt_masks, rng, cfg)

        cls_logits, cls_probs, bbox_deltas = self.classifier(
            mrcnn_feature_maps, tgt["rois"], train=train_bn)
        pred_masks = self.mask(mrcnn_feature_maps, tgt["rois"],
                               train=train_bn)

        return {
            "rpn_class_logits": rpn_class_logits[0],
            "rpn_bbox": rpn_bbox[0],
            "targets": tgt,
            "mrcnn_class_logits": cls_logits,
            "mrcnn_bbox": bbox_deltas,
            "mrcnn_masks": pred_masks,
        }
