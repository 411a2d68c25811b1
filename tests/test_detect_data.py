"""Mask R-CNN training data layer (load_image_gt equivalent) + CLI smoke.

mold_gt_example mirrors maskrcnn/model.py:1154-1212 + utils.py:338-373;
the VKITTI dataset mirrors maskrcnn/vkitti.py:43-124 instance decoding.
"""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from sdn3d_tpu.models.maskrcnn import MaskRCNNConfig, generate_pyramid_anchors
from sdn3d_tpu.data.detect_data import (
    VKittiDetectDataset, minimize_mask, mold_gt_example,
    synthetic_detect_example)

CFG = MaskRCNNConfig(
    image_min_dim=128, image_max_dim=128, num_classes=3,
    stage_sizes=(1, 1, 1, 1), fpn_channels=32,
    pre_nms_limit=100, post_nms_rois_training=40,
    train_rois_per_image=12, mask_shape=(14, 14), mask_pool_size=7,
    rpn_train_anchors_per_image=32)


@pytest.fixture(scope="module")
def anchors():
    return np.asarray(generate_pyramid_anchors(CFG))


def test_minimize_mask_rectangle():
    m = np.zeros((100, 100), np.float32)
    m[20:60, 30:70] = 1.0
    mini = minimize_mask(m, [20, 30, 60, 70], (28, 28))
    assert mini.shape == (28, 28)
    assert mini.min() == 1.0          # the crop is entirely inside the box


def test_mold_gt_example_boxes_and_masks(anchors):
    img = np.full((64, 128, 3), 128, np.uint8)
    mask = np.zeros((64, 128), np.float32)
    mask[16:48, 32:96] = 1.0
    ex = mold_gt_example(img, np.asarray([1], np.int32), mask[None],
                         CFG, anchors, mini_shape=(28, 28), max_gt=4)
    assert ex["image"].shape == (128, 128, 3)
    assert ex["gt_class_ids"][0] == 1 and (ex["gt_class_ids"][1:] == 0).all()
    # 64x128 -> scale 1.0 (min(h,w)=64 -> scale=2 would exceed max_dim on
    # w: 128*2=256 > 128 -> scale = 128/128 = 1.0), pad top = 32
    y1, x1, y2, x2 = ex["gt_boxes"][0] * 128
    assert x1 == pytest.approx(32) and x2 == pytest.approx(96)
    assert y1 == pytest.approx(16 + 32) and y2 == pytest.approx(48 + 32)
    # mini-mask of a full rectangle is all ones
    assert ex["gt_masks"][0].min() == 1.0
    # rpn targets: some positive anchors and the fixed-shape bbox array
    assert ex["rpn_match"].shape == anchors.shape[:1]
    assert (ex["rpn_match"] == 1).sum() >= 1
    assert ex["rpn_bbox"].shape == (CFG.rpn_train_anchors_per_image, 4)


def test_synthetic_example_shapes(anchors):
    ex = synthetic_detect_example(CFG, anchors, seed=3)
    assert ex["image"].shape == (128, 128, 3)
    # padded to config.max_gt_instances (MAX_GT_INSTANCES=100)
    assert ex["gt_masks"].shape == (CFG.max_gt_instances, 56, 56)
    assert (ex["gt_class_ids"] > 0).sum() >= 1


def test_vkitti_detect_dataset(tmp_path):
    from make_vkitti_fixture import build_fixture

    root = str(tmp_path / "vk")
    os.makedirs(root)
    items = [{"world": "0006", "topic": "fog", "source": "00055",
              "target": "00050", "operations": []}]
    ej = os.path.join(root, "edit.json")
    with open(ej, "w") as f:
        json.dump(items, f)
    build_fixture(root, ej)

    anchors = np.asarray(generate_pyramid_anchors(CFG))
    # the benchmark frames the fixture materializes live in the test split
    ds = VKittiDetectDataset(root, CFG, anchors, split="test")
    assert len(ds) > 0
    ex = ds[0]
    assert ex["image"].shape == (128, 128, 3)
    n = int((ex["gt_class_ids"] > 0).sum())
    if n:                                 # fixture frames carry cars
        assert set(np.unique(ex["gt_class_ids"])) <= {0, 1, 2}
        b = ex["gt_boxes"][:n]
        assert (b[:, 2] > b[:, 0]).all() and (b[:, 3] > b[:, 1]).all()
        assert ex["gt_masks"][:n].max() == 1.0


@pytest.mark.slow
def test_detect_train_cli_synthetic(tmp_path):
    from sdn3d_tpu.cli.detect_train import main
    ck = str(tmp_path / "ck")
    main(["--dataset", "synthetic", "--small", "--stage", "heads",
          "--num_iters", "2", "--num_epochs", "1", "--save_every", "1",
          "--ckpt_dir", ck])
    assert os.path.isdir(ck)


def test_rpn_targets_from_full_gt(anchors):
    """RPN targets must be built BEFORE the max_gt head truncation
    (model.py:1384-1394): anchors over dropped instances stay positive."""
    H = W = 128
    img = np.zeros((H, W, 3), np.float32)
    masks, ids = [], []
    # 3 well-separated boxes; max_gt=2 forces a head subsample
    for y1, x1 in [(8, 8), (8, 72), (72, 8)]:
        m = np.zeros((H, W), np.float32)
        m[y1:y1 + 40, x1:x1 + 40] = 1.0
        masks.append(m)
        ids.append(1)
    # build_rpn_targets subsamples pos/neg anchors via np.random
    # (model.py:1268-1282) — seed identically so only max_gt differs
    np.random.seed(7)
    ex = mold_gt_example(img, np.asarray(ids, np.int32), np.stack(masks),
                         CFG, anchors, max_gt=2)
    np.random.seed(7)
    full = mold_gt_example(img, np.asarray(ids, np.int32), np.stack(masks),
                           CFG, anchors, max_gt=3)
    # identical RPN targets regardless of the head truncation
    np.testing.assert_array_equal(ex["rpn_match"], full["rpn_match"])
    np.testing.assert_array_equal(ex["rpn_bbox"], full["rpn_bbox"])
    # heads carry exactly max_gt instances
    assert (ex["gt_class_ids"] > 0).sum() == 2
    assert (full["gt_class_ids"] > 0).sum() == 3


def test_minimize_mask_bilinear_threshold():
    """utils.py:356: bilinear resize then >= 128 threshold — a diagonal
    half-plane mask keeps a smooth boundary (nearest would jagger it and
    shift area)."""
    m = np.zeros((64, 64), np.float32)
    yy, xx = np.mgrid[:64, :64]
    m[yy + xx < 64] = 1.0
    mini = minimize_mask(m, [0, 0, 64, 64], (56, 56))
    # bilinear + threshold keeps the half-plane area within 2%
    assert abs(mini.mean() - 0.5) < 0.02
