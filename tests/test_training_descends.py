"""N-step descent tests for all four trainers (VERDICT r2 item 5).

The single-step finiteness tests prove a step runs; these prove the
trainers actually LEARN — overfitting a tiny fixed fixture and asserting
the loss descends over N steps.  This is where REINFORCE sign errors,
G/D alternation bugs, BN freeze mistakes, and LR-schedule NaNs hide
(reference behaviors: bulb/net.py:100-197, textural/train.py:52-144,
maskrcnn/model.py:1823-1963, semantic/vkitti_train.py:20-71).

All slow-tier: each test pays real jit compiles on CPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow


def _mean(xs):
    return float(np.mean(xs))


def test_semantic_training_descends():
    """Dual poly-LR SGD over encoder/decoder descends on a fixed batch
    (vkitti_train.py:20-71 semantics: NLL + 0.4 deep supervision)."""
    from sdn3d_tpu.models.semantic import SemanticModel
    from sdn3d_tpu.pipelines.semantic import SemanticTrainer

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 5, (2, 4, 4)).astype(np.int32))

    model = SemanticModel(num_class=5)
    trainer = SemanticTrainer(model=model, max_iters=100)
    state = trainer.init(jax.random.PRNGKey(0), images)
    step = jax.jit(trainer.make_train_step())

    losses = []
    for i in range(25):
        state, metrics = step(state, images, labels, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert _mean(losses[-5:]) < 0.5 * _mean(losses[:5]), losses


def test_textural_gan_training_descends():
    """Alternating G/D with the history pool AND the VAE global encoder:
    G's reconstruction L1 descends while both optimizers run
    (train.py:86-95, pix2pixHD_model.py:168-174,235-238)."""
    import dataclasses

    from sdn3d_tpu.pipelines.textural import TexturalConfig, TexturalTrainer

    cfg = TexturalConfig(ngf=8, ndf=8, nef=4, n_downsample_global=2,
                         n_blocks_global=1, n_downsample_e=2, n_layers_d=2,
                         use_vgg_loss=False, max_instances=8,
                         use_global_encoder=True, global_encoder_nef=8,
                         pool_size=4, lr=5e-4)
    trainer = TexturalTrainer(cfg)
    H, W = 32, 32
    rng = np.random.RandomState(0)
    inst = np.zeros((1, H, W), np.int32)
    inst[:, :, W // 2:] = 1
    batch = {
        "label": jnp.asarray(rng.randint(0, 14, (1, H, W)).astype(np.int32)),
        "inst": jnp.asarray(inst),
        "inst_slots": jnp.asarray(inst),
        "image": jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32)
                             * 2 - 1),
        "pose": jnp.asarray(rng.randint(0, 25, (1, H, W)).astype(np.int32)),
        "normal": jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32)),
    }
    state = trainer.init(jax.random.PRNGKey(0), H, W)
    # the fused single-dispatch iteration (G update + device pool + D
    # update in ONE jit) is the CLI's training path since r5
    train_iter = jax.jit(trainer.make_train_iteration())
    pool = trainer.device_pool(H, W)

    l1s = []
    for i in range(36):
        state, losses, pool = train_iter(state, batch,
                                         jax.random.PRNGKey(i), pool)
        l1s.append(float(losses["G_L1"]))
        assert np.isfinite(list(losses.values())).all()
    assert int(pool.n) > 0, "history pool never filled"
    assert _mean(l1s[-6:]) < 0.75 * _mean(l1s[:6]), l1s


def test_detect_training_descends_through_stages():
    """Mask R-CNN total loss descends across the staged-freeze schedule
    (heads -> 4+ -> all), with opt_state re-initialized per stage like
    run_schedule / the reference's per-call optimizer
    (maskrcnn/model.py:1867-1874)."""
    from sdn3d_tpu.models.maskrcnn import MaskRCNNConfig
    from sdn3d_tpu.models.maskrcnn_train import build_rpn_targets
    from sdn3d_tpu.pipelines.detect_train import MaskRCNNTrainer

    cfg = MaskRCNNConfig(
        image_min_dim=128, image_max_dim=128, num_classes=3,
        stage_sizes=(1, 1, 1, 1), fpn_channels=32,
        pre_nms_limit=100, post_nms_rois_training=40,
        train_rois_per_image=12, mask_shape=(14, 14), mask_pool_size=7,
        rpn_train_anchors_per_image=32)

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(1, 128, 128, 3).astype(np.float32))
    gt_boxes_px = np.asarray([[20, 20, 80, 90], [40, 60, 100, 120]],
                             np.float32)
    G = 4
    gt_ids = jnp.asarray(np.pad(np.asarray([1, 2]), (0, G - 2)))
    gt_boxes = jnp.asarray(np.pad(gt_boxes_px / 128.0,
                                  ((0, G - 2), (0, 0))))
    gt_masks = jnp.asarray(np.ones((G, 28, 28), np.float32))

    state = None
    totals = []
    for stage, steps in [("heads", 15), ("4+", 15), ("all", 15)]:
        trainer = MaskRCNNTrainer(config=cfg, stage=stage,
                                  learning_rate=2e-3)
        match, target_bbox = build_rpn_targets(
            np.asarray(trainer.anchors), gt_boxes_px, cfg)
        if state is None:
            state = trainer.init(jax.random.PRNGKey(0))
        else:
            state = dict(state)
            state["opt_state"] = trainer.tx.init(state["params"])
        step = jax.jit(trainer.make_train_step())
        for i in range(steps):
            state, losses = step(state, images, jnp.asarray(match),
                                 jnp.asarray(target_bbox), gt_ids,
                                 gt_boxes, gt_masks,
                                 jax.random.PRNGKey(i), trainer.anchors)
            total = float(sum(losses.values()))
            assert np.isfinite(total), (stage, i, losses)
            totals.append(total)
    # Measured trajectory on random weights: the first steps sit at a
    # NEUTRAL-INIT artifact (zero logits -> log(2) RPN class loss ~0.9),
    # the loss then JUMPS as predictions sharpen (~2.8-3.3) and descends
    # steadily from that peak.  The jump's step index moves between runs
    # (XLA:CPU threaded reductions reassociate, flipping REINFORCE
    # roi-sampling draws), so a fixed "warm window" straddles it
    # unpredictably — anchor the descent assertion on the PEAK instead,
    # plus a no-late-blowup guard.
    assert _mean(totals[-3:]) < 0.75 * max(totals), totals
    assert max(totals[-5:]) < max(totals), totals


def test_derenderer_full_mode_descends_with_reinforce():
    """full-mode derenderer training: mask loss descends with REINFORCE
    class sampling active (main.py:114-154, __init__.py:131-140 score-
    function gradient).  Geometry losses share the step, as in training."""
    from sdn3d_tpu.data.synthetic import (make_derender_batch,
                                          make_sphere_mesh)
    from sdn3d_tpu.geometry.assets import build_mesh_bank
    from sdn3d_tpu.models.derenderer import DeviceMeshBank, Derenderer, \
        TargetType
    from sdn3d_tpu.pipelines.derender import DerenderTrainer

    IMAGE = RENDER = 32
    verts, faces = make_sphere_mesh(4, 8)
    bank = DeviceMeshBank.from_host(build_mesh_bank([(verts, faces)] * 3))
    model = Derenderer(num_classes=3)
    trainer = DerenderTrainer(model=model, bank=bank,
                              mode=TargetType.full, image_size=IMAGE,
                              render_size=RENDER, lr=3e-3,
                              mask_weight=1.0)
    batch = make_derender_batch(4, IMAGE)
    batch["masks"] = np.zeros((4, 1, RENDER, RENDER), np.float32)
    batch["masks"][:, :, 8:24, 8:24] = 1.0
    batch["ignores"] = np.zeros_like(batch["masks"])
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    state = trainer.init(jax.random.PRNGKey(0), batch)
    step = jax.jit(trainer.make_train_step())

    mask_losses = []
    for i in range(20):
        state, losses = step(state, batch, jax.random.PRNGKey(i))
        assert np.isfinite(list(map(float, losses.values()))).all()
        mask_losses.append(float(losses["mask_loss"]))
    assert _mean(mask_losses[-4:]) < 0.85 * _mean(mask_losses[:4]), \
        mask_losses
