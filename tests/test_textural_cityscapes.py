"""Textural Cityscapes dataset (reference textural/data/
cityscapes_dataset.py:1-141 + cityscapes_labels.py) and the ui_model
demo path driven from it (pipelines/interactive.py)."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from sdn3d_tpu.data.textural_cityscapes import (
    TexturalCityscapesDataset, get_cityscapes_lists,
    ids_to_train_ids_shifted, pose_bins)

H, W = 64, 128
NAMES = ["darmstadt_000000_000019", "darmstadt_000001_000019"]


def _write(path, arr, mode=None):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr, mode=mode).save(path)


def make_fixture(root, precomputed=False):
    """Synthetic cityscapes layout: 2 frames with road/sky/car content.
    With precomputed=True the semantic/geometric-branch output dirs are
    laid out too (segm train-id maps, small-int instance maps + pose
    JSON + normal PNGs)."""
    rng = np.random.RandomState(0)
    ann = {"images": []}
    for k, name in enumerate(NAMES):
        fn = f"{name}_leftImg8bit.png"
        ann["images"].append({
            "file_name": fn,
            "seg_file_name": f"{name}_gtFine_instanceIds.png"})
        _write(os.path.join(root, "images", fn),
               rng.randint(0, 255, (H, W, 3), np.uint8))

        label = np.full((H, W), 7, np.uint8)       # road
        label[:H // 3] = 23                        # sky
        label[40:56, 40:80] = 26                   # car
        _write(os.path.join(root, "gtFine", "train", "darmstadt",
                            f"{name}_gtFine_labelIds.png"), label)
        inst = label.astype(np.int32).copy()
        inst[40:56, 40:80] = 26000 + k             # car instance
        # gtFine instanceIds ship as 16-bit PNGs (ids <= 33999 fit)
        _write(os.path.join(root, "gtFine", "train", "darmstadt",
                            f"{name}_gtFine_instanceIds.png"),
               inst.astype(np.uint16))

        if precomputed:
            # semantic branch writes trainId+1 maps
            _write(os.path.join(root, "segm", "darmstadt", fn),
                   ids_to_train_ids_shifted(
                       label.astype(np.int32)).astype(np.uint8))
            # geometric branch writes small-int instance maps + json
            ginst = np.zeros((H, W), np.uint8)
            ginst[40:56, 40:80] = 1                # big car -> slot 1
            ginst[2:4, 2:4] = 2                    # tiny (<256 px) car
            _write(os.path.join(root, "geo", "darmstadt",
                                f"{name}.png"), ginst)
            with open(os.path.join(root, "geo", "darmstadt",
                                   f"{name}.json"), "w") as f:
                json.dump({"1": {"class_id": 1, "alpha": 0.5,
                                 "depth": 10.0},
                           "2": {"class_id": 1, "alpha": -0.5,
                                 "depth": 12.0}}, f)
            _write(os.path.join(root, "geo", "darmstadt",
                                f"{name}-normal.png"),
                   rng.randint(0, 255, (H, W, 3), np.uint8))
    os.makedirs(os.path.join(root, "annotations"), exist_ok=True)
    with open(os.path.join(root, "annotations",
                           "instancesonly_gtFine_train.json"), "w") as f:
        json.dump(ann, f)


def test_lists_seeded_shuffle(tmp_path):
    root = str(tmp_path)
    make_fixture(root)
    a = get_cityscapes_lists(root, "train")
    b = get_cityscapes_lists(root, "train")
    assert [r["image"] for r in a] == [r["image"] for r in b]
    assert len(a) == 2
    # aligned per record: label/inst/image share the frame stem
    for r in a:
        stem = os.path.basename(r["image"]).replace("_leftImg8bit.png", "")
        assert stem in r["label"] and stem in r["inst"]


def test_gtfine_item(tmp_path):
    """Non-precomputed path: raw ids -> trainId+1, gtFine instanceIds
    used directly (cityscapes_dataset.py:104-107,:64)."""
    root = str(tmp_path)
    make_fixture(root)
    ds = TexturalCityscapesDataset(root, "train", load_size=W,
                                   fine_wh=(W, H))
    item = ds.__getitem__(0, np.random.RandomState(0))
    # road 7 -> trainId 0 + 1; sky 23 -> 10 + 1; car 26 -> 13 + 1
    assert set(np.unique(item["label"])) == {1, 11, 14}
    assert item["inst"].max() >= 26000          # raw instance ids
    assert item["image"].shape == (H, W, 3)
    assert item["pose"].max() == 0              # no pose dir
    np.testing.assert_allclose(item["normal"], 0.0)
    assert item["inst_slots"].max() >= 1


def test_precomputed_item(tmp_path):
    """Precomputed path: inst x255 x1000 + background fill, pose bins
    with the <256 px skip, normal +1/255 bias
    (cityscapes_dataset.py:60-63,:79-91,:99-101)."""
    root = str(tmp_path)
    make_fixture(root, precomputed=True)
    ds = TexturalCityscapesDataset(
        root, "train",
        segm_precomputed=os.path.join(root, "segm"),
        inst_precomputed=os.path.join(root, "geo"),
        pose_dir=os.path.join(root, "geo"),
        normal_dir=os.path.join(root, "geo"),
        load_size=W, fine_wh=(W, H))
    # val-style determinism for assertions: train crops are identity here
    # (load_size == W, fine_wh == (W, H)) so coordinates are stable
    item = ds.__getitem__(0, np.random.RandomState(3))
    flip = bool(np.random.RandomState(3).rand() > 0.5)

    def fx(x):                       # map a column through the item flip
        return W - 1 - x if flip else x

    # big car: inst id 1 -> 1000; background filled with the label map
    assert item["inst"][48, fx(60)] == 1000
    sky = item["inst"][4, fx(4)]
    assert sky == item["label"][4, fx(4)]
    # pose: alpha 0.5 digitized into the 24-bin table; tiny car skipped
    expect_bin = int(np.digitize(0.5 / np.pi, pose_bins(24)))
    assert item["pose"][48, fx(60)] == expect_bin
    assert item["pose"][2, fx(2)] == 0           # area < 256 -> skipped
    # normal: normalized [-1, 1] + 1/255 bias
    assert item["normal"].min() >= -1.0 + 1 / 255 - 1e-6
    assert item["normal"].max() <= 1.0 + 1 / 255 + 1e-6
    # label comes from the precomputed map unchanged
    assert set(np.unique(item["label"])) <= {1, 11, 14}


def test_missing_inst_fallback(tmp_path):
    """FileNotFoundError path: inst = label (cityscapes_dataset.py:64-65)."""
    root = str(tmp_path)
    make_fixture(root, precomputed=True)
    for name in NAMES:
        os.remove(os.path.join(root, "geo", "darmstadt", f"{name}.png"))
    ds = TexturalCityscapesDataset(
        root, "train",
        segm_precomputed=os.path.join(root, "segm"),
        inst_precomputed=os.path.join(root, "geo"),
        load_size=W, fine_wh=(W, H))
    item = ds.__getitem__(0, np.random.RandomState(0))
    np.testing.assert_array_equal(item["inst"], item["label"])


@pytest.mark.slow
def test_interactive_session_over_cityscapes(tmp_path):
    """The reference ui_model demo path: a cityscapes item drives an
    interactive edit session (cluster codes by class band, click label
    swap, undo) and generates through the textural model
    (textural/models/ui_model.py on Cityscapes)."""
    import jax

    from sdn3d_tpu.pipelines.interactive import (
        EditSession, change_labels_click, load_state, to_batch)
    from sdn3d_tpu.pipelines.textural import (TexturalConfig,
                                              TexturalTrainer)

    root = str(tmp_path)
    make_fixture(root)
    ds = TexturalCityscapesDataset(root, "train", load_size=W,
                                   fine_wh=(W, H))
    item = ds.__getitem__(0, np.random.RandomState(1))

    car_band = int(item["inst"].max()) // 1000       # 26
    clusters = {car_band: np.arange(15, dtype=np.float32).reshape(3, 5),
                1: np.zeros((2, 5), np.float32),
                11: np.full((2, 5), 2.0, np.float32)}
    st = load_state(item["label"], item["inst"], clusters,
                    pose=item["pose"], normal=item["normal"])
    car_id = int(item["inst"].max())
    assert car_id in st.feat_codes

    sess = EditSession(st)
    car_yx = tuple(int(v[0]) for v in np.where(item["inst"] == car_id))
    road_yx = tuple(int(v[0]) for v in np.where(item["label"] == 1))
    sess.apply(change_labels_click, car_yx, road_yx)
    assert not (sess.state.inst == car_id).any()
    sess.undo()
    assert (sess.state.inst == car_id).any()

    # generate through a tiny textural model (ui demo forward)
    cfg = TexturalConfig(label_nc=20, ngf=8, ndf=8, nef=4,
                         n_downsample_global=2, n_blocks_global=1,
                         n_downsample_e=2, n_layers_d=2,
                         use_vgg_loss=False, max_instances=8)
    trainer = TexturalTrainer(cfg)
    state = trainer.init(jax.random.PRNGKey(0), H, W)
    batch = to_batch(sess.state, max_instances=cfg.max_instances)
    fake = np.asarray(trainer.fake_inference_jit(
        state, {k: np.asarray(v) for k, v in batch.items()
                if k != "feat_map"},
        np.asarray(batch["feat_map"])))
    assert fake.shape == (1, H, W, 3)
    assert np.isfinite(fake).all()
