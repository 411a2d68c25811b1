"""Semantic train-time augmentation tests (semantic/vkitti_dataset.py:57-163)."""

import random

import numpy as np
import pytest

pytestmark = pytest.mark.quick

from sdn3d_tpu.data.semantic_data import (
    prepare_train_sample, resize_shorter_edge, round2nearest_multiple)


def test_resize_shorter_edge():
    # VKITTI frames are 375x1242; short edge 150 -> scale 0.4
    h, w = resize_shorter_edge(375, 1242, 150)
    assert h == 150 and w == 496
    # at the top scale the reference cap (1274, vkitti_train.py:237) does
    # NOT bind — the frame keeps its full 1242 width
    h, w = resize_shorter_edge(375, 1242, 375)
    assert (h, w) == (375, 1242)
    # the cap engages only beyond the dataset's own sizes
    h, w = resize_shorter_edge(375, 1242, 500)
    assert w <= 1274


def test_round2nearest_multiple():
    assert round2nearest_multiple(150, 8) == 152
    assert round2nearest_multiple(152, 8) == 152


def test_prepare_train_sample_shapes_and_labels():
    rng = random.Random(0)
    rgb = (np.random.RandomState(0).rand(375, 1242, 3) * 255).astype(np.uint8)
    segm = np.random.RandomState(1).randint(0, 14, (375, 1242))
    out = prepare_train_sample(rgb, segm, rng, scales=(100,))
    img, lab = out["image"], out["label"]
    assert img.shape[0] % 8 == 0 and img.shape[1] % 8 == 0
    assert lab.shape == (img.shape[0] // 8, img.shape[1] // 8)
    # labels shifted by -1: raw 0 becomes ignore (-1)
    assert lab.min() >= -1 and lab.max() <= 12
    # padded border area has ignore labels
    assert lab[-1, -1] == -1 or lab.min() == -1
    # pad pixels are 0 IN NORMALIZED SPACE (the reference copies the
    # normalized image into a zero canvas, vkitti_dataset.py:108,152-157);
    # normalizing after padding would put ~-540 in the border
    assert img.shape[0] > 100            # scale 100 -> 100 rows + pad
    np.testing.assert_array_equal(img[101:], 0.0)
    assert abs(float(img[:100].mean())) > 0.01   # content is normalized
