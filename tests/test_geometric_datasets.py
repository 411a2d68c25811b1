"""Dataset selection + hybrid training wiring for the geometric branch
(reference derender3d/data_loader.py:43-82, datasets.py:837-971,
:1115-1123): CityscapesSemantics derenderer crops, (dataset, mode)
selection, weighted hybrid sampling, zero-fill collate across
heterogeneous key sets, and the geometric_train CLI end-to-end on
kitti / cityscapes fixtures."""

import json
import os

import numpy as np
import pytest
from PIL import Image

H, W = 128, 256


def make_cityscapes_derender_fixture(root):
    """gtFine instanceIds + disparity + leftImg8bit for 2 frames with one
    car each (ids 26000+k)."""
    rng = np.random.RandomState(0)
    for k, (seq, frame) in enumerate([("000035", "000019"),
                                      ("000036", "000019")]):
        gt = os.path.join(root, "gtFine", "train", "darmstadt")
        im = os.path.join(root, "images", "leftImg8bit", "train",
                          "darmstadt")
        dp = os.path.join(root, "disparity", "train", "darmstadt")
        for d in (gt, im, dp):
            os.makedirs(d, exist_ok=True)
        stem = f"darmstadt_{seq}_{frame}"
        scene = np.zeros((H, W), np.uint16)
        scene[30:90, 40:110] = 26000 + k          # car instance
        scene[95:120, 150:220] = 24000            # person -> not a car
        Image.fromarray(scene).save(
            os.path.join(gt, f"{stem}_gtFine_instanceIds.png"))
        disp = np.zeros((H, W), np.uint16)
        disp[30:90, 40:110] = 100                 # object plane
        disp[0:20, 0:30] = 200                    # something nearer
        Image.fromarray(disp).save(
            os.path.join(dp, f"{stem}_disparity.png"))
        Image.fromarray(rng.randint(0, 255, (H, W, 3), np.uint8)).save(
            os.path.join(im, f"{stem}_leftImg8bit.png"))


def make_kitti_object_fixture(root):
    """label_2 + calib + image_2 for 2 frames with one Car each."""
    rng = np.random.RandomState(1)
    lab = os.path.join(root, "training", "label_2")
    cal = os.path.join(root, "training", "calib")
    img = os.path.join(root, "training", "image_2")
    for d in (lab, cal, img):
        os.makedirs(d, exist_ok=True)
    for frame in (0, 1):
        with open(os.path.join(lab, f"{frame:06d}.txt"), "w") as f:
            f.write("Car 0.00 0 -1.58 87.01 33.33 174.12 100.12 "
                    "1.65 1.67 3.64 -0.65 1.71 46.70 -1.59\n")
        with open(os.path.join(cal, f"{frame:06d}.txt"), "w") as f:
            f.write("P2: 721.5377 0.0 128.0 44.857 0.0 721.5377 "
                    "64.0 0.216 0.0 0.0 1.0 0.0027\n")
        Image.fromarray(rng.randint(0, 255, (H, W, 3), np.uint8)).save(
            os.path.join(img, f"{frame:06d}.png"))


def make_kitti_semantics_fixture(root):
    rng = np.random.RandomState(2)
    inst_dir = os.path.join(root, "training", "instance")
    img_dir = os.path.join(root, "training", "image_2")
    os.makedirs(inst_dir, exist_ok=True)
    os.makedirs(img_dir, exist_ok=True)
    scene = np.zeros((H, W), np.uint16)
    scene[30:90, 40:110] = 6601                  # car (66xx)
    Image.fromarray(scene).save(os.path.join(inst_dir, "000000_10.png"))
    Image.fromarray(rng.randint(0, 255, (H, W, 3), np.uint8)).save(
        os.path.join(img_dir, "000000_10.png"))


def test_cityscapes_semantics_dataset(tmp_path):
    """datasets.py:837-971: car instances from gtFine, disparity-p95
    ignore over the WHOLE frame, nominal-camera roi norms, cache JSON."""
    from sdn3d_tpu.data.cityscapes import Camera
    from sdn3d_tpu.data.cityscapes_derender import \
        CityscapesSemanticsDataset

    root = str(tmp_path)
    make_cityscapes_derender_fixture(root)
    ds = CityscapesSemanticsDataset(root, is_train=True,
                                    image_size=64, render_size=64)
    assert len(ds) == 2                          # one car per frame
    item = ds[0]
    assert item["targets"] == 2                  # finetune
    assert item["images"].shape == (64, 64, 3)
    assert item["masks"].shape == (1, 64, 64)
    assert item["masks"].max() == 1.0
    # the nearer blob (disparity 200 > p95 of the car's 100) is ignored;
    # the ignore crop is over the roi, so just assert it is not all-zero
    # in-frame semantics were exercised via disparity_ignore directly:
    assert np.isfinite(item["ignores"]).all()
    assert float(item["focals"][0]) == Camera.focal
    # cache written and reused
    caches = os.listdir(os.path.join(root, "_cache"))
    assert len(caches) == 2
    ds2 = CityscapesSemanticsDataset(root, is_train=True)
    assert len(ds2) == 2


def test_select_by_dataset_and_mode(tmp_path):
    """data_loader.py:43-82 selection table."""
    from sdn3d_tpu.data.loader import HybridDataset, WeightedSampler
    from sdn3d_tpu.data.select import select_derender_dataset
    from sdn3d_tpu.models.derenderer import TargetType

    kroot = str(tmp_path / "kitti")
    ksem = str(tmp_path / "ksem")
    croot = str(tmp_path / "cs")
    make_kitti_object_fixture(kroot)
    make_kitti_semantics_fixture(ksem)
    make_cityscapes_derender_fixture(croot)

    ds, smp = select_derender_dataset(
        "kitti", TargetType.extend, kitti_object_root=kroot)
    assert smp is None and len(ds) == 2
    assert ds[0]["targets"] == 1                 # pretrain items

    ds, smp = select_derender_dataset(
        "kitti", TargetType.finetune, kitti_semantics_root=ksem,
        image_size=64, render_size=64)
    assert smp is None and ds[0]["targets"] == 2

    ds, smp = select_derender_dataset(
        "kitti", TargetType.full, kitti_object_root=kroot,
        kitti_semantics_root=ksem, image_size=64, render_size=64)
    assert isinstance(ds, HybridDataset)
    assert isinstance(smp, WeightedSampler)
    assert len(ds) == 3
    # weighted stream draws from both sources
    idx = [i for i, _ in zip(iter(smp), range(64))]
    assert min(idx) < 2 and max(idx) >= 2

    ds, smp = select_derender_dataset(
        "cityscapes", TargetType.extend, cityscapes_root=croot,
        image_size=64, render_size=64)
    assert smp is None and ds[0]["targets"] == 2

    with pytest.raises(ValueError):
        select_derender_dataset("kitti", TargetType.normal)


def test_zero_fill_collate_heterogeneous(tmp_path):
    """Hybrid batches mix KittiObject items (geometry targets, no masks)
    with KittiSemantics items (masks, no thetas): the collate zero-fills
    the union of keys (data_loader.py:17-40)."""
    from sdn3d_tpu.data.loader import zero_fill_collate
    from sdn3d_tpu.data.select import select_derender_dataset
    from sdn3d_tpu.models.derenderer import TargetType

    kroot = str(tmp_path / "kitti")
    ksem = str(tmp_path / "ksem")
    make_kitti_object_fixture(kroot)
    make_kitti_semantics_fixture(ksem)
    ds, _ = select_derender_dataset(
        "kitti", TargetType.full, kitti_object_root=kroot,
        kitti_semantics_root=ksem, image_size=64, render_size=64)
    obj_item = ds[0]            # KittiObject: has thetas, no masks
    sem_item = ds[2]            # KittiSemantics: has masks, no thetas
    assert "masks" not in obj_item and "thetas" in obj_item
    assert "masks" in sem_item and "thetas" not in sem_item

    batch = zero_fill_collate([obj_item, sem_item])
    assert batch["masks"].shape[0] == 2
    np.testing.assert_allclose(batch["masks"][0], 0.0)   # zero-filled
    assert batch["masks"][1].max() == 1.0
    np.testing.assert_allclose(np.asarray(batch["thetas"][1]), 0.0)
    np.testing.assert_array_equal(batch["targets"], [1, 2])


@pytest.mark.slow
def test_geometric_train_cli_kitti_and_cityscapes(tmp_path):
    """The CLI runs extend-mode end-to-end on kitti and cityscapes
    fixtures (VERDICT r2 item 7): dataset selection, prefetch loader,
    train steps, checkpoint write."""
    from sdn3d_tpu.cli.geometric_train import main

    kroot = str(tmp_path / "kitti")
    croot = str(tmp_path / "cs")
    make_kitti_object_fixture(kroot)
    make_cityscapes_derender_fixture(croot)

    common = ["--mode", "extend", "--synthetic_bank_only"]
    del common  # (no such flag; synthetic bank comes from no shapenet_root)

    for dataset, root_flag, root in [
            ("kitti", "--kitti_object_root", kroot),
            ("cityscapes", "--cityscapes_root", croot)]:
        ckpt = str(tmp_path / f"ckpt_{dataset}")
        main(["--mode", "extend", "--dataset", dataset, root_flag, root,
              "--batch_size", "2", "--image_size", "64",
              "--render_size", "64", "--num_iters", "2",
              "--num_workers", "1", "--save_every", "2",
              "--ckpt_dir", ckpt, "--shapenet_root", ""])
        assert os.path.isdir(ckpt)
