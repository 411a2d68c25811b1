"""Textural (pix2pixHD) pipeline tests: G/D alternating steps, inference."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sdn3d_tpu.pipelines.textural import (
    TexturalConfig, TexturalTrainer, encode_input)


# Split fixtures: `cfg_batch` is cheap (no flax init / jit); `setup`
# additionally pays trainer.init (~70 s of CPU compiles) and is only
# pulled in by slow-marked tests, keeping the default tier fast.
@pytest.fixture(scope="module")
def cfg_batch():
    cfg = TexturalConfig(ngf=8, ndf=8, nef=4, n_downsample_global=2,
                         n_blocks_global=2, n_downsample_e=2, n_layers_d=2,
                         use_vgg_loss=False, max_instances=8)
    trainer = TexturalTrainer(cfg)
    H, W = 48, 64
    rng = np.random.RandomState(0)
    inst = np.zeros((1, H, W), np.int32)
    inst[:, :, W // 2:] = 1
    batch = {
        "label": jnp.asarray(rng.randint(0, 14, (1, H, W)).astype(np.int32)),
        "inst": jnp.asarray(inst),
        "inst_slots": jnp.asarray(inst),
        "image": jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32) * 2 - 1),
        "pose": jnp.asarray(rng.randint(0, 25, (1, H, W)).astype(np.int32)),
        "normal": jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32)),
    }
    return trainer, batch


@pytest.fixture(scope="module")
def setup(cfg_batch):
    trainer, batch = cfg_batch
    state = trainer.init(jax.random.PRNGKey(0), 48, 64)
    return trainer, state, batch


@pytest.mark.slow
def test_g_and_d_steps(setup):
    trainer, state, batch = setup
    g_step = jax.jit(trainer.make_g_step())
    d_step = jax.jit(trainer.make_d_step())
    state1, g_losses = g_step(state, batch)
    state2, d_losses = d_step(state1, batch)
    for k, v in {**g_losses, **d_losses}.items():
        assert np.isfinite(float(v)), k
    # G params moved, D params moved
    dg = jax.tree_util.tree_reduce(
        lambda a, b: a + float(jnp.abs(b).sum()),
        jax.tree_util.tree_map(lambda a, b: a - b, state1.params_g,
                               state.params_g), 0.0)
    dd = jax.tree_util.tree_reduce(
        lambda a, b: a + float(jnp.abs(b).sum()),
        jax.tree_util.tree_map(lambda a, b: a - b, state2.params_d,
                               state1.params_d), 0.0)
    assert dg > 0 and dd > 0


@pytest.mark.slow
def test_fake_inference_shape_and_range(setup):
    trainer, state, batch = setup
    out = trainer.fake_inference(state, batch)
    assert out.shape == (1, 48, 64, 3)
    assert float(jnp.abs(out).max()) <= 1.0


@pytest.mark.slow
def test_fake_inference_absent_normal_is_exact_zero(setup):
    """A frame with NO normal map (the reference's 'no cars' case,
    textural/edit_vkitti.py:88-95) must condition the generator on exact
    f32 zeros.  The serving path ships normals as uint8 with on-device
    normalization ((x/255-0.5)/0.5+1/255), which maps zero BYTES to
    ~-0.996 — `normal_valid` zeroes those frames after normalization."""
    trainer, state, batch = setup
    H, W = batch["normal"].shape[1:3]
    # reference/file path: exact f32 zeros normal
    ref_batch = dict(batch)
    ref_batch["normal"] = jnp.zeros((1, H, W, 3), jnp.float32)
    ref = np.asarray(trainer.fake_inference(state, ref_batch))
    # serving path: zero uint8 bytes + normal_valid=0
    srv_batch = dict(batch)
    srv_batch["normal"] = jnp.zeros((1, H, W, 3), jnp.uint8)
    srv_batch["normal_valid"] = jnp.asarray([0.0], jnp.float32)
    srv = np.asarray(trainer.fake_inference(state, srv_batch))
    np.testing.assert_array_equal(ref, srv)
    # and normal_valid=1 must NOT disturb the uint8 normalization path
    u8 = (np.clip(np.asarray(batch["normal"]), 0, 1) * 255).astype(np.uint8)
    a_batch = dict(batch)
    a_batch["normal"] = jnp.asarray(u8)
    a = np.asarray(trainer.fake_inference(state, a_batch))
    b_batch = dict(a_batch)
    b_batch["normal_valid"] = jnp.asarray([1.0], jnp.float32)
    b = np.asarray(trainer.fake_inference(state, b_batch))
    np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_fake_inference_uint8_inst_plane_matches_int32_map(setup):
    """The serving path ships the RAW uint8 instance plane (1 B/pixel)
    instead of the int32 k*1000 map (4 B/pixel); fake_inference
    reconstructs the map on device with assemble_condition_maps' exact
    integer math (textural_data.py:86-97: background pixels carry the
    relabeled segm, instance pixels k*1000).  Both encodings must
    produce byte-identical generator output."""
    trainer, state, batch = setup
    H, W = batch["normal"].shape[1:3]
    rng = np.random.RandomState(3)
    label = rng.randint(0, 14, (1, H, W)).astype(np.uint8)
    inst_raw = np.zeros((1, H, W), np.uint8)
    inst_raw[:, :, W // 2:] = 1
    inst_raw[:, :H // 3, :W // 4] = 7
    # host/file path: the int32 k*1000 map assemble_condition_maps builds
    inst_map = np.where(inst_raw == 0, label.astype(np.int32),
                        inst_raw.astype(np.int32) * 1000)
    ref_batch = dict(batch, label=jnp.asarray(label),
                     inst=jnp.asarray(inst_map))
    ref = np.asarray(trainer.fake_inference(state, ref_batch))
    srv_batch = dict(ref_batch, inst=jnp.asarray(inst_raw))
    srv = np.asarray(trainer.fake_inference(state, srv_batch))
    np.testing.assert_array_equal(ref, srv)


def test_netG_input_channels():
    cfg = TexturalConfig()
    # label 14 + edge 1 + feat 5 + pose 25 + normal 3 (base_options defaults)
    assert cfg.netG_input_nc == 48
    assert cfg.netD_input_nc == 18
    cfg2 = dataclasses.replace(cfg, feat_depth=True)
    assert cfg2.netG_input_nc == 49


@pytest.mark.slow
def test_global_encoder_vae_path(setup):
    """use_global_encoder: z conditioning channels + KL loss + netGlobalE
    params training (pix2pixHD_model.py:190-198,235-238)."""
    trainer0, _, batch = setup
    cfg = dataclasses.replace(trainer0.cfg, use_global_encoder=True,
                              global_encoder_nef=8)
    assert cfg.netG_input_nc == trainer0.cfg.netG_input_nc + 3
    trainer = TexturalTrainer(cfg)
    state = trainer.init(jax.random.PRNGKey(0), 48, 64)
    assert state.params_ge, "netGlobalE params missing"

    g_step = jax.jit(trainer.make_g_step())
    rng = jax.random.PRNGKey(7)
    state1, losses = g_step(state, batch, rng)
    assert "E_VAE" in losses and np.isfinite(float(losses["E_VAE"]))
    dge = jax.tree_util.tree_reduce(
        lambda a, b: a + float(jnp.abs(b).sum()),
        jax.tree_util.tree_map(lambda a, b: a - b, state1.params_ge,
                               state.params_ge), 0.0)
    assert dge > 0, "netGlobalE did not train"

    # d step with z-sampled fake; inference sampled vs posterior-mean differ
    d_step = jax.jit(trainer.make_d_step())
    state2, d_losses = d_step(state1, batch, rng)
    assert np.isfinite(float(d_losses["D_fake"]))
    out_mean = trainer.fake_inference(state1, batch)
    out_sampled = trainer.fake_inference(state1, batch,
                                         rng=jax.random.PRNGKey(3))
    assert out_mean.shape == (1, 48, 64, 3)
    assert float(jnp.abs(out_mean - out_sampled).max()) > 0


@pytest.mark.slow
def test_image_pool_wiring(setup):
    """pool_size > 0 routes a history-pooled conditioning‖fake stack into
    the D fake loss (pix2pixHD_model.py:168-174)."""
    trainer0, _, batch = setup
    cfg = dataclasses.replace(trainer0.cfg, pool_size=4)
    trainer = TexturalTrainer(cfg)
    state = trainer.init(jax.random.PRNGKey(0), 48, 64)
    d_step = jax.jit(trainer.make_d_step())
    for i in range(3):
        fc = trainer.pooled_fake_concat(state, batch)
        assert fc.shape == (1, 48, 64, cfg.netD_input_nc)
        state, losses = d_step(state, batch, None, fc)
        assert np.isfinite(float(losses["D_fake"])), i
    assert len(trainer.fake_pool.images) >= 1


def test_device_image_pool_semantics():
    """DeviceImagePool must reproduce the host ImagePool's per-sample
    sequential semantics (util/image_pool.py:6-32): fill in order
    returning inputs; once full, return either the input (buffer
    untouched) or a historical entry that gets replaced by the input."""
    from sdn3d_tpu.utils.image_pool import DeviceImagePool

    P, shape = 2, (3,)
    pool = DeviceImagePool.create(P, shape)
    imgs = jnp.arange(12.0).reshape(4, 3)

    # filling phase: returns inputs, buffer filled in order
    out, pool = DeviceImagePool.query(pool, imgs[:2], jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(imgs[:2]))
    np.testing.assert_array_equal(np.asarray(pool.buf),
                                  np.asarray(imgs[:2]))
    assert int(pool.n) == 2

    # full phase: each output is the input (no buffer change at that
    # step) or a pre-step buffer row whose slot now holds the input
    for k in range(5):
        before = np.asarray(pool.buf)
        out, pool = DeviceImagePool.query(pool, imgs[2:3],
                                          jax.random.PRNGKey(100 + k))
        after = np.asarray(pool.buf)
        o = np.asarray(out[0])
        x = np.asarray(imgs[2])
        if np.array_equal(o, x):
            # ambiguous only if x already equals a buffer row (it never
            # does here: imgs rows are distinct and x was never swapped
            # in while o == x means no swap happened)
            assert np.array_equal(before, after) or \
                any(np.array_equal(after[i], x) for i in range(P))
        else:
            hit = [i for i in range(P) if np.array_equal(before[i], o)]
            assert hit, "returned a value not from history"
            assert np.array_equal(after[hit[0]], x), "swap did not store"
        assert int(pool.n) == 2

    # pool_size=0: pass-through, identical object semantics
    p0 = DeviceImagePool.create(0, shape)
    out, p0b = DeviceImagePool.query(p0, imgs, jax.random.PRNGKey(1))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(imgs))


@pytest.mark.slow
def test_fused_train_iteration_matches_sequential(setup):
    """make_train_iteration (ONE jit: G update + pool + D update, the
    CLI's path since r5) must compute the same math as its sequential
    decomposition: g_step, then d_step on the OLD-params fake (the
    reference's one-forward-feeds-both-losses semantics,
    train.py:61-95).  Tolerance not byte-equality: one fused program
    fuses differently than three.  The parity optimizer is SGD — Adam's
    first step is ~lr*sign(g), which amplifies 1-ulp fusion differences
    on near-zero gradients into +-2*lr param differences (observed on
    the D biases)."""
    import optax

    trainer0, _, batch = setup
    trainer = TexturalTrainer(trainer0.cfg)
    trainer.tx_g = optax.sgd(1e-3)
    trainer.tx_d = optax.sgd(1e-3)
    state = trainer.init(jax.random.PRNGKey(0), 48, 64)
    it = jax.jit(trainer.make_train_iteration())
    fused_state, fused_losses, _ = it(state, batch)

    # sequential equivalent
    fake, input_label, _ = trainer._generate(state.params_g,
                                             state.params_e, batch,
                                             state.params_ge, None)
    fake_concat = jnp.concatenate([input_label, fake], axis=-1)
    g_step = jax.jit(trainer.make_g_step())
    d_step = jax.jit(trainer.make_d_step())
    seq_state, g_losses = g_step(state, batch)
    seq_state, d_losses = d_step(seq_state, batch,
                                 fake_concat=fake_concat)
    seq_losses = {**g_losses, **d_losses}

    for k, v in fused_losses.items():
        np.testing.assert_allclose(float(v), float(seq_losses[k]),
                                   rtol=2e-4, err_msg=k)
    for name in ("params_g", "params_d", "params_e"):
        a = jax.tree_util.tree_leaves(getattr(fused_state, name))
        b = jax.tree_util.tree_leaves(getattr(seq_state, name))
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       atol=2e-5, err_msg=name)


def test_encode_input_shapes(cfg_batch):
    trainer, batch = cfg_batch
    x = encode_input(trainer.cfg, batch["label"], batch["inst"])
    assert x.shape == (1, 48, 64, 15)
    # one-hot sums to 1 on the label block
    np.testing.assert_allclose(np.asarray(x[..., :14]).sum(-1), 1.0)


@pytest.fixture()
def textural_fixture(tmp_path):
    """Tiny on-disk replica of the reference train layout: rgb + segm +
    geometric outputs for 2 train-split frames (0001/clone 0 and 1)."""
    import json
    import os
    from PIL import Image

    root, segm, geo = (str(tmp_path / d) for d in ("vk", "segm", "geo"))
    W, H = 64, 32
    rng = np.random.RandomState(0)
    for frame in (0, 1):
        rel = f"0001/clone/{frame:05d}.png"
        for base in (os.path.join(root, "vkitti_1.3.1_rgb"), segm, geo):
            os.makedirs(os.path.dirname(os.path.join(base, rel)),
                        exist_ok=True)
        Image.fromarray(rng.randint(0, 255, (H, W, 3), dtype=np.uint8)
                        ).save(os.path.join(root, "vkitti_1.3.1_rgb", rel))
        # shifted-space semantic output: road(4), car(1), van(11)
        lab = np.full((H, W), 4, np.uint8)
        lab[4:12, 8:24] = 1           # car, half covered by instance 1
        lab[20:28, 40:56] = 11        # van, NOT covered by any instance
        Image.fromarray(lab).save(os.path.join(segm, rel))
        inst = np.zeros((H, W), np.uint8)
        inst[4:12, 8:16] = 1
        Image.fromarray(inst).save(os.path.join(geo, rel))
        with open(os.path.join(geo, rel.replace(".png", ".json")), "w") as f:
            json.dump({"1": {"class_id": 1, "alpha": 0.5, "depth": 9.0}}, f)
        Image.fromarray(rng.randint(0, 255, (H, W, 3), dtype=np.uint8)).save(
            os.path.join(geo, rel.replace(".png", "-normal.png")))
    return root, segm, geo, (W, H)


def test_textural_train_dataset(textural_fixture):
    """TexturalVKittiDataset mirrors vkitti_dataset.py train semantics:
    +1 label shift, car/van removal ONLY where inst==0, k*1000 bg-filled
    instance ids, pose bins from the json alphas."""
    from sdn3d_tpu.data.textural_data import TexturalVKittiDataset

    root, segm, geo, (W, H) = textural_fixture
    ds = TexturalVKittiDataset(root, segm, geo, split="train",
                               load_size=W, fine_wh=(W, 16),
                               max_instances=8, augment=False)
    assert len(ds) == 2
    rng = np.random.RandomState(1)
    s = ds.__getitem__(0, rng)
    assert s["image"].shape == (16, W, 3) and s["label"].shape == (16, W)
    # use an uncropped view for the semantics checks
    ds2 = TexturalVKittiDataset(root, segm, geo, split="train",
                                load_size=W, fine_wh=(W, H),
                                max_instances=8, augment=False)
    ds2.train = False            # central crop (= none at full size), no flip
    s = ds2[0]
    lab, inst, pose = s["label"], s["inst"], s["pose"]
    # car pixels WITH an instance keep their (shifted) car label 2
    assert (lab[inst == 1000] == 2).all()
    # car pixels WITHOUT an instance were removed to road-ish 5
    assert (lab[5, 20] == 5)
    # the uninstanced van (11 -> shifted 12) is removed to 5 as well
    assert (lab[22, 44] == 5)
    # background instance ids take the label value; instanced = k*1000
    assert (inst[0, 0] == lab[0, 0]) and (inst[5, 10] == 1000)
    # pose bin from alpha=0.5 under the 24-bin table
    from sdn3d_tpu.data.textural_data import POSE_BINS
    assert (pose[inst == 1000] ==
            int(np.digitize(0.5 / np.pi, POSE_BINS))).all()
    assert (pose[inst != 1000] == 0).all()
    batch = ds2.batch(np.random.RandomState(2), 2)
    assert batch["image"].shape == (2, H, W, 3)
    assert batch["inst_slots"].max() < 8


@pytest.mark.slow
def test_textural_train_cli_dataset_mode(textural_fixture, tmp_path):
    """The train CLI drives real on-disk data end-to-end (small nets)."""
    from sdn3d_tpu.cli.textural_train import main
    from sdn3d_tpu.core.checkpoint import latest_step

    root, segm, geo, (W, H) = textural_fixture
    ck = str(tmp_path / "ck")
    main(["--data_root", root, "--segm_dir", segm, "--geo_dir", geo,
          "--small", "--no_vgg", "--num_iters", "2", "--batch_size", "1",
          "--load_size", str(W), "--fine_width", str(W),
          "--fine_height", str((H // 4) * 4), "--save_every", "2",
          "--ckpt_dir", ck])
    assert latest_step(ck) == 2


@pytest.mark.quick
def test_global_encoder_odd_width():
    """GlobalEncoder must init at the production 192x624 (odd widths in
    the downsampling stack: 624 -> 39 -> 20 stride-2 conv vs pool)."""
    import jax
    import jax.numpy as jnp

    from sdn3d_tpu.models.pix2pixhd import GlobalEncoder

    enc = GlobalEncoder(nz=3, nef=8)
    v = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 192, 624, 3)))
    mu, logvar = enc.apply(v, jnp.zeros((1, 192, 624, 3)))
    assert mu.shape == (1, 3) and logvar.shape == (1, 3)


def test_missing_inst_map_falls_back_to_label(textural_fixture, tmp_path):
    """Frames without a geometric instance PNG use inst = label with NO
    car/van relabel (the reference's FileNotFoundError fallback,
    vkitti_dataset.py:87-88, raises before the 2/12 -> 5 remap)."""
    import os

    from sdn3d_tpu.data.textural_data import TexturalVKittiDataset

    root, segm, geo, (W, H) = textural_fixture
    ds = TexturalVKittiDataset(root, segm, str(tmp_path / "empty_geo"),
                               split="train", load_size=W, fine_wh=(W, H),
                               max_instances=8)
    s = ds[0]
    # inst == label everywhere, and car/van labels survive (+1 shift:
    # raw car 1 -> 2, raw van 11 -> 12 stay, no remap to 5)
    np.testing.assert_array_equal(s["inst"], s["label"])
    assert (s["label"] == 2).any()          # car pixels kept
    assert (s["label"] == 12).any()         # van pixels kept


def test_partial_depth_coverage_keeps_stable_batch_keys(textural_fixture):
    """'depth' is a dataset-level key: with only SOME frames carrying
    -depth.png the key must stay out of every sample, or jitted train
    steps would retrace on a flickering batch pytree."""
    import os

    import numpy as np
    from PIL import Image

    from sdn3d_tpu.data.textural_data import TexturalVKittiDataset

    root, segm, geo, (W, H) = textural_fixture
    # give frame 0 (only) a depth map
    d = (np.ones((H, W)) * 30000).astype(np.uint16)
    Image.fromarray(d).save(os.path.join(geo, "0001/clone/00000-depth.png"))
    ds = TexturalVKittiDataset(root, segm, geo, split="train",
                               load_size=W, fine_wh=(W, H), max_instances=8)
    assert not ds.with_depth
    assert "depth" not in ds[0] and "depth" not in ds[1]
