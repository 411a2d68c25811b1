"""motgt -> GT target math tests (derender3d/datasets.py:351-391).

Cross-checked property: rendering an object with the GT pose derived here
must project its center back to the motgt 2D center."""

import numpy as np
import pytest

pytestmark = pytest.mark.quick

from sdn3d_tpu.data.vkitti import Camera
from sdn3d_tpu.data.vkitti_derender import (
    WIDTH_CORRECTION, mask_to_roi, motgt_targets, object_depth_sq,
    occlusion_ignore, training_row_filter)


def make_row(ry=0.3, l3d=4.0, h3d=1.5, w3d=1.8, x3d=2.0, y3d=1.6, z3d=15.0,
             t=150, l=600, b=220, r=700, truncr=0.0, occupr=1.0):
    return dict(ry=ry, l3d=l3d, h3d=h3d, w3d=w3d, x3d=x3d, y3d=y3d, z3d=z3d,
                t=t, l=l, b=b, r=r, truncr=truncr, occupr=occupr)


def test_motgt_targets_math():
    row = make_row()
    roi = (row["t"], row["l"], row["b"], row["r"])
    tg = motgt_targets(row, roi)

    np.testing.assert_allclose(tg["thetas"], [-0.3], atol=1e-6)
    np.testing.assert_allclose(
        tg["rotations"], [np.cos(0.15), 0, -np.sin(0.15), 0], atol=1e-6)
    np.testing.assert_allclose(
        tg["scales"], [4.0, 1.5, WIDTH_CORRECTION * 1.8], rtol=1e-6)
    # xyz convention: (x, -(y - h/2), -z)
    np.testing.assert_allclose(tg["translations"],
                               [2.0, -(1.6 - 0.75), -15.0], atol=1e-5)
    # log-depth carries the roi-area normalization
    d2 = object_depth_sq(row)
    droi_y = (row["b"] - row["t"]) / Camera.focal
    droi_x = (row["r"] - row["l"]) / Camera.focal
    np.testing.assert_allclose(
        tg["log_depths"], [np.log(d2) + np.log(droi_y) + np.log(droi_x)],
        rtol=1e-5)
    assert np.all(np.abs(tg["translation2ds"]) <= 6)


def test_targets_roundtrip_through_pose_model():
    """The derenderer's pose decoding (models.derenderer.pose_from_blob)
    must invert these targets: depths^2 * area == exp(log_depth)."""
    import jax.numpy as jnp
    from sdn3d_tpu.models.derenderer import pose_from_blob

    row = make_row()
    roi = (row["t"], row["l"], row["b"], row["r"])
    tg = motgt_targets(row, roi)

    rn = tg["roi_norms"]
    blob = {
        "_mroi_norms": jnp.asarray([[(rn[2] + rn[0]) / 2,
                                     (rn[3] + rn[1]) / 2]]),
        "_droi_norms": jnp.asarray([[rn[2] - rn[0], rn[3] - rn[1]]]),
        "_focals": jnp.asarray([[Camera.focal]]),
        "_theta_deltas": jnp.asarray([[np.cos(tg["thetas"][0]),
                                       np.sin(tg["thetas"][0])]]),
        "_translation2ds": jnp.asarray([tg["translation2ds"]]),
        "_log_scales": jnp.asarray([tg["log_scales"]]),
        "_log_depths": jnp.asarray([tg["log_depths"]]),
    }
    pose = pose_from_blob(blob, image_size=256, render_size=384,
                          training=False)
    # recovered depth == |xyz| of the GT translation
    want_depth = np.sqrt(object_depth_sq(row))
    np.testing.assert_allclose(float(pose["_depths"][0, 0]), want_depth,
                               rtol=1e-4)
    # recovered quaternion matches the GT rotation target
    np.testing.assert_allclose(np.asarray(pose["_rotations"][0]),
                               tg["rotations"], atol=1e-5)
    # recovered 3D translation direction matches GT (unit vectors)
    t_gt = tg["translations"] / np.linalg.norm(tg["translations"])
    t_got = np.asarray(pose["_translations"][0])
    t_got = t_got / np.linalg.norm(t_got)
    np.testing.assert_allclose(t_got, t_gt, atol=2e-3)


def test_mask_to_roi_and_ignore():
    masks = np.zeros((3, 10, 10), np.float32)
    masks[0, 2:5, 2:5] = 1
    masks[1, 3:8, 3:8] = 1
    masks[2, 0:2, 0:2] = 1
    assert mask_to_roi(masks[0]) == (2, 2, 5, 5)
    depths = np.asarray([10.0, 5.0, 20.0])
    ign = occlusion_ignore(masks, depths, own_index=0)
    # object 1 is nearer -> its mask is ignored for object 0
    assert ign[4, 4] == 1 and ign[2, 2] == 0


def test_training_row_filter():
    assert training_row_filter(make_row())
    assert not training_row_filter(make_row(b=155, r=610))      # tiny
    assert not training_row_filter(make_row(truncr=0.8))
    assert not training_row_filter(make_row(occupr=0.2))


def test_vkitti_derender_dataset(tmp_path):
    """Full per-object training dataset (datasets.py:279-420): masks from
    scenegt codes, filtered rows, GT targets, occlusion ignores, cropped
    tensors."""
    import os
    from PIL import Image
    from sdn3d_tpu.data.vkitti_derender import VKittiDerenderDataset

    root = str(tmp_path)
    world, topic, frame = "0001", "clone", 400  # test-split range
    gt_dir = os.path.join(root, "vkitti_1.3.1_scenegt")
    os.makedirs(os.path.join(gt_dir, world, topic), exist_ok=True)
    for w in ["0001", "0002", "0006", "0018", "0020"]:
        for t in ["15-deg-left", "15-deg-right", "30-deg-left",
                  "30-deg-right", "clone", "fog", "morning", "overcast",
                  "rain", "sunset"]:
            with open(os.path.join(
                    gt_dir, f"{w}_{t}_scenegt_rgb_encoding.txt"), "w") as f:
                f.write("name r g b\n")
                if (w, t) == (world, topic):
                    f.write("Car:1 200 10 10\nCar:2 10 200 10\n")

    H, W = 96, 128
    scene = np.zeros((H, W, 3), np.uint8)
    scene[30:80, 60:110] = [10, 200, 10]    # car 2 (far)
    scene[20:60, 20:70] = [200, 10, 10]     # car 1 (near, painted on top)
    Image.fromarray(scene).save(
        os.path.join(gt_dir, world, topic, f"{frame:05d}.png"))
    rgb_dir = os.path.join(root, "vkitti_1.3.1_rgb", world, topic)
    os.makedirs(rgb_dir)
    Image.fromarray(np.random.RandomState(0).randint(
        0, 255, (H, W, 3), np.uint8)).save(
        os.path.join(rgb_dir, f"{frame:05d}.png"))

    mot_dir = os.path.join(root, "vkitti_1.3.1_motgt")
    os.makedirs(mot_dir)
    header = ("frame tid orig_label truncr occupr l t r b "
              "w3d h3d l3d x3d y3d z3d ry\n")
    # car 1 at depth 10, car 2 at depth 30; the third row fails the
    # area filter (tiny box)
    rows = [
        f"{frame} 1 Car 0.0 0.9 20 20 70 60 1.8 1.6 4.0 1.0 1.5 10.0 0.3\n",
        f"{frame} 2 Car 0.0 0.9 60 30 110 80 1.8 1.6 4.0 -2.0 1.5 30.0 -0.5\n",
    ]
    with open(os.path.join(mot_dir, f"{world}_{topic}.txt"), "w") as f:
        f.write(header + "".join(rows))

    ds = VKittiDerenderDataset(root, is_train=False)
    assert len(ds) == 2
    item = ds[0]
    assert item["targets"] == 3
    assert item["images"].shape == (224, 224, 3)
    assert item["masks"].shape == (1, 256, 256)
    assert item["ignores"].shape == (1, 256, 256)
    assert item["masks"].max() == 1.0
    # nearer car 1 has no ignores inside the frame region; car 2 (farther)
    # is occluded by car 1 -> nonzero ignore
    item2 = ds[1]
    inner = item["ignores"][0, 64:192, 64:192]
    assert inner.sum() == 0.0
    assert item2["ignores"].sum() > 0.0
    # targets: theta = -ry
    np.testing.assert_allclose(item["thetas"], [-0.3], atol=1e-6)
    np.testing.assert_allclose(np.exp(item["log_scales"]),
                               [4.0, 1.6, 1.2206 * 1.8], rtol=1e-5)
    assert np.isfinite(item["log_depths"]).all()
    # frame 400 of world 0001 is in the TEST split only
    ds_train = VKittiDerenderDataset(root, is_train=True)
    assert len(ds_train) == 0
