"""KITTI data-layer tests (datasets.py:423-606)."""

import numpy as np

from sdn3d_tpu.data.kitti import (
    hybrid_weights, kitti_targets, parse_calib_file, parse_label_file)


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


def test_hybrid_weights():
    w = hybrid_weights([4, 2], weights=[1.0, 3.0])
    assert len(w) == 6
    np.testing.assert_allclose(w[:4], 0.25)
    np.testing.assert_allclose(w[4:], 1.5)
    # expected total draw mass ratio 1:3
    assert abs(w[4:].sum() / w[:4].sum() - 3.0) < 1e-6
