"""Mask R-CNN training-layer tests: target assignment and losses."""

import numpy as np

import jax
import jax.numpy as jnp

from sdn3d_tpu.models.maskrcnn import MaskRCNNConfig
from sdn3d_tpu.models import maskrcnn_train as MT


CFG = MaskRCNNConfig(train_rois_per_image=12, mask_shape=(8, 8),
                     rpn_train_anchors_per_image=16)


def test_build_rpn_targets():
    np.random.seed(0)
    anchors = np.asarray([
        [0, 0, 10, 10], [0, 0, 12, 12], [50, 50, 60, 60],
        [100, 100, 130, 130], [5, 5, 15, 15], [200, 200, 220, 220],
    ], np.float32)
    gt = np.asarray([[0, 0, 11, 11]], np.float32)
    match, deltas = MT.build_rpn_targets(anchors, gt, CFG)
    assert match.shape == (6,)
    assert match[1] == 1            # near-perfect overlap anchor
    assert (match == 1).sum() >= 1 and (match == -1).sum() >= 1
    # positive deltas rows are finite
    assert np.isfinite(deltas).all()


def test_detection_targets_shapes_and_semantics():
    rng = jax.random.PRNGKey(0)
    P, G = 20, 3
    props = np.zeros((P, 4), np.float32)
    # 5 proposals tightly around gt 1, 5 around gt 2, rest background
    props[:5] = [0.1, 0.1, 0.3, 0.3]
    props[5:10] = [0.5, 0.5, 0.8, 0.8]
    props[10:] = [0.0, 0.0, 0.05, 0.05]
    gt_boxes = np.asarray([[0.1, 0.1, 0.3, 0.3],
                           [0.5, 0.5, 0.8, 0.8],
                           [0, 0, 0, 0]], np.float32)
    gt_ids = np.asarray([1, 2, 0], np.int32)
    gt_masks = np.ones((G, 16, 16), np.float32)

    out = MT.detection_targets(jnp.asarray(props), jnp.ones(P, bool),
                               jnp.asarray(gt_ids), jnp.asarray(gt_boxes),
                               jnp.asarray(gt_masks), rng, CFG)
    T = CFG.train_rois_per_image
    assert out["rois"].shape == (T, 4)
    assert out["masks"].shape == (T, 8, 8)
    is_pos = np.asarray(out["is_pos"])
    cls = np.asarray(out["class_ids"])
    # positives got their gt class; negatives are class 0
    assert set(cls[is_pos]).issubset({1, 2})
    assert (cls[~is_pos] == 0).all()
    # positive rois matched exactly -> zero deltas, full masks
    np.testing.assert_allclose(np.asarray(out["deltas"])[is_pos], 0,
                               atol=1e-4)
    assert np.asarray(out["masks"])[is_pos].mean() > 0.99


def test_losses_finite_and_zero_when_perfect():
    A = 10
    rpn_match = jnp.asarray([1, -1, 0, 1, -1, 0, 0, 0, 0, 0])
    perfect_logits = jnp.where(
        (rpn_match == 1)[:, None],
        jnp.asarray([[-20.0, 20.0]]), jnp.asarray([[20.0, -20.0]]))
    assert float(MT.rpn_class_loss(rpn_match, perfect_logits)) < 1e-3

    target_bbox = jnp.zeros((4, 4))
    rpn_pred = jnp.zeros((A, 4))
    assert float(MT.rpn_bbox_loss(target_bbox, rpn_match, rpn_pred)) == 0.0

    T, C = 6, 3
    cls = jnp.asarray([1, 2, 0, 0, 0, 0])
    valid = jnp.ones(T, bool)
    logits = jax.nn.one_hot(cls, C) * 20.0
    assert float(MT.mrcnn_class_loss(cls, valid, logits)) < 1e-3

    is_pos = cls > 0
    deltas = jnp.zeros((T, 4))
    pred_deltas = jnp.zeros((T, C, 4))
    assert float(MT.mrcnn_bbox_loss(deltas, cls, is_pos, pred_deltas)) == 0.0

    masks = jnp.ones((T, 8, 8))
    pred_masks = jnp.ones((T, 8, 8, C)) * 0.999
    l = float(MT.mrcnn_mask_loss(masks, cls, is_pos, pred_masks))
    assert 0 <= l < 1e-2
