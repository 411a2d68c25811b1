"""KITTI data-layer tests (datasets.py:423-769)."""

import numpy as np
import pytest

pytestmark = pytest.mark.quick

from sdn3d_tpu.data.kitti import (
    KittiSemanticsDataset, hybrid_weights, kitti_targets, parse_calib_file,
    parse_label_file, semantics_instance_cat)


def test_label_and_calib_parsing(tmp_path):
    label = ("Car 0.00 0 -1.58 587.01 173.33 614.12 200.12 "
             "1.65 1.67 3.64 -0.65 1.71 46.70 -1.59\n"
             "DontCare -1 -1 -10 503.89 169.71 590.61 190.13 "
             "-1 -1 -1 -1000 -1000 -1000 -10\n")
    p = tmp_path / "000000.txt"
    p.write_text(label)
    rows = parse_label_file(str(p))
    assert len(rows) == 2 and rows[0]["type"] == "Car"
    assert rows[0]["ry"] == -1.59 and rows[0]["l"] == 3.64

    calib = ("P0: 7.215377e+02 0 6.095593e+02 0 0 7.215377e+02 "
             "1.728540e+02 0 0 0 1 0\n"
             "P2: 721.5377 0.0 609.5593 44.85728 0.0 721.5377 "
             "172.854 0.2163791 0.0 0.0 1.0 0.002745884\n")
    c = tmp_path / "calib.txt"
    c.write_text(calib)
    cam = parse_calib_file(str(c))
    assert abs(cam["focal"] - 721.5377) < 1e-3
    assert abs(cam["u0"] - 609.5593) < 1e-3
    assert abs(cam["v0"] - 172.854) < 1e-3


def test_kitti_targets_no_width_correction():
    row = dict(type="Car", truncated=0, occluded=0, alpha=0.0,
               left=600.0, top=170.0, right=650.0, bottom=210.0,
               h=1.6, w=1.8, l=4.0, x=1.0, y=1.7, z=20.0, ry=0.4)
    cam = {"focal": 721.5, "u0": 609.6, "v0": 172.9}
    tg = kitti_targets(row, cam)
    # scale = (l, h, w): no 1.2206 factor (unlike VKITTI)
    np.testing.assert_allclose(np.exp(tg["log_scales"]), [4.0, 1.6, 1.8],
                               rtol=1e-5)
    np.testing.assert_allclose(tg["thetas"], [-0.4])
    assert np.isfinite(tg["log_depths"]).all()


def test_kitti_semantics_dataset(tmp_path):
    """Synthetic KITTI-semantics fixture: car instances are filtered by
    category, area, and aspect ratio; items yield finetune-mode masks
    (datasets.py:609-769)."""
    from PIL import Image

    inst_dir = tmp_path / "training" / "instance"
    img_dir = tmp_path / "training" / "image_2"
    inst_dir.mkdir(parents=True)
    img_dir.mkdir(parents=True)

    H, W = 128, 256
    scene = np.zeros((H, W), np.int32)
    scene[30:90, 40:110] = 6601      # car instance (6601 // 100 == 66)
    scene[10:20, 200:210] = 6602     # car but area 100 <= 32*32 -> filtered
    scene[95:125, 120:250] = 2500    # category 25 != car -> filtered
    Image.fromarray(scene.astype(np.uint16)).save(
        inst_dir / "000000_10.png")
    rgb = np.random.RandomState(0).randint(
        0, 255, (H, W, 3), dtype=np.uint8)
    Image.fromarray(rgb).save(img_dir / "000000_10.png")

    assert semantics_instance_cat(6601) == 66

    ds = KittiSemanticsDataset(str(tmp_path), is_train=True,
                               image_size=64, render_size=64)
    assert len(ds) == 1
    item = ds[0]
    assert item["targets"] == 2                      # finetune = reproject
    assert item["images"].shape == (64, 64, 3)
    assert item["masks"].shape == (1, 64, 64)
    assert item["masks"].max() == 1.0 and item["masks"].min() == 0.0
    assert item["ignores"].sum() == 0.0
    assert np.isfinite(item["roi_norms"]).all()

    # ROI cache JSON was written and is reused on a second construction.
    cache = tmp_path / "_cache" / "_000000.json"
    assert cache.is_file()
    ds2 = KittiSemanticsDataset(str(tmp_path), is_train=True)
    assert len(ds2) == 1


def test_hybrid_weights():
    w = hybrid_weights([4, 2], weights=[1.0, 3.0])
    assert len(w) == 6
    np.testing.assert_allclose(w[:4], 0.25)
    np.testing.assert_allclose(w[4:], 1.5)
    # expected total draw mass ratio 1:3
    assert abs(w[4:].sum() / w[:4].sum() - 3.0) < 1e-6
