"""Cityscapes data-layer tests."""

import numpy as np
import pytest

pytestmark = pytest.mark.quick

from sdn3d_tpu.data.cityscapes import (
    CAR_ID, Camera, car_instances, disparity_ignore, id_map_to_train_ids,
    index2cat, instance_mask, color_map)


def test_instance_decoding():
    ids = np.asarray([[26000, 26001, 7], [24000, 26002, 0]])
    assert index2cat(np.int64(26001)) == CAR_ID
    assert car_instances(ids) == [26000, 26001, 26002]
    m = instance_mask(ids, 26001)
    assert m.sum() == 1 and m[0, 1] == 1


def test_train_id_mapping():
    raw = np.asarray([[7, 26, 0], [23, 33, 11]])
    t = id_map_to_train_ids(raw)
    np.testing.assert_array_equal(t, [[0, 13, 255], [10, 18, 2]])
    cm = color_map()
    assert tuple(cm[26]) == (0, 0, 142)


def test_disparity_ignore():
    disp = np.zeros((10, 10), np.float32)
    disp[:, :5] = 10.0     # object band
    disp[:, 5:] = 50.0     # much nearer stuff
    mask = np.zeros((10, 10), np.float32)
    mask[:, :5] = 1.0
    ign = disparity_ignore(disp, mask)
    assert ign[0, 7] == 1.0 and ign[0, 2] == 0.0


def test_camera():
    assert Camera.focal == 2250.0 and Camera.u0 == 925.0
