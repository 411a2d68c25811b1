"""Shape/behavior tests for the branch models (small configs on CPU)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.mark.slow
def test_semantic_model_shapes():
    from sdn3d_tpu.models.semantic import SemanticModel, segmentation_loss, \
        pixel_accuracy

    model = SemanticModel(num_class=14)
    x = jnp.zeros((1, 64, 96, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    # inference: upsampled softmax
    probs = model.apply(variables, x, seg_size=(64, 96), train=False)
    assert probs.shape == (1, 64, 96, 14)
    np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, atol=1e-4)

    # training: log-softmax pair (deep supervision), output stride 8
    out, _ = model.apply(variables, x, train=True,
                         rngs={"dropout": jax.random.PRNGKey(1)},
                         mutable=["batch_stats"])
    log_p, log_d = out
    assert log_p.shape == (1, 8, 12, 14)
    labels = jnp.zeros((1, 8, 12), jnp.int32).at[0, 0, 0].set(-1)
    loss = segmentation_loss(log_p, labels)
    acc = pixel_accuracy(log_p, labels)
    assert np.isfinite(float(loss)) and 0 <= float(acc) <= 1


def test_adaptive_avg_pool_matches_torch_semantics():
    from sdn3d_tpu.models.semantic import adaptive_avg_pool2d
    x = jnp.asarray(np.random.RandomState(0).rand(1, 7, 5, 2)
                    .astype(np.float32))
    out = np.asarray(adaptive_avg_pool2d(x, (3, 3)))
    xn = np.asarray(x)
    # torch windows: start=floor(i*in/out), end=ceil((i+1)*in/out)
    for i in range(3):
        for j in range(3):
            ys, ye = (i * 7) // 3, -(-((i + 1) * 7) // 3)
            xs, xe = (j * 5) // 3, -(-((j + 1) * 5) // 3)
            np.testing.assert_allclose(
                out[0, i, j], xn[0, ys:ye, xs:xe].mean(axis=(0, 1)),
                rtol=1e-5)


@pytest.fixture(scope="module")
def mrcnn_setup():
    from sdn3d_tpu.models.maskrcnn import (
        MaskRCNN, MaskRCNNConfig, generate_pyramid_anchors)
    cfg = MaskRCNNConfig(
        image_min_dim=128, image_max_dim=128, num_classes=3,
        stage_sizes=(1, 1, 1, 1), fpn_channels=32,
        pre_nms_limit=200, post_nms_rois_inference=50,
        detection_max_instances=10)
    anchors = generate_pyramid_anchors(cfg)
    model = MaskRCNN(config=cfg)
    return cfg, anchors, model


@pytest.mark.slow
def test_maskrcnn_inference_shapes(mrcnn_setup):
    cfg, anchors, model = mrcnn_setup
    img = jnp.zeros((1, 128, 128, 3))
    variables = model.init(jax.random.PRNGKey(0), img, jnp.asarray(anchors),
                           (0.0, 0.0, 128.0, 128.0), train=False)
    out = model.apply(variables, img, jnp.asarray(anchors),
                      (0.0, 0.0, 128.0, 128.0), train=False)
    assert out["proposals"].shape == (50, 4)
    assert out["detections"].shape == (10, 6)
    assert out["masks"].shape == (10, 28, 28, 3)
    a = np.asarray(out["rpn_class_logits"])
    assert a.shape[1] == anchors.shape[0]


def test_maskrcnn_box_deltas_roundtrip():
    from sdn3d_tpu.models.maskrcnn import apply_box_deltas
    boxes = jnp.asarray([[10.0, 20.0, 50.0, 80.0]])
    out = np.asarray(apply_box_deltas(boxes, jnp.zeros((1, 4))))
    np.testing.assert_allclose(out, [[10, 20, 50, 80]], rtol=1e-6)
    out2 = np.asarray(apply_box_deltas(
        boxes, jnp.asarray([[0.0, 0.0, np.log(2.0), 0.0]])))
    np.testing.assert_allclose(out2[0, 2] - out2[0, 0], 80.0, rtol=1e-5)


@pytest.mark.slow
def test_pix2pixhd_generator_and_discriminator():
    from sdn3d_tpu.models.pix2pixhd import (
        GlobalGenerator, MultiscaleDiscriminator, Encoder,
        gan_loss_lsgan, feature_matching_loss)
    G = GlobalGenerator(output_nc=3, ngf=8, n_downsampling=2, n_blocks=2)
    x = jnp.zeros((1, 64, 96, 7))
    gv = G.init(jax.random.PRNGKey(0), x)
    y = G.apply(gv, x)
    assert y.shape == (1, 64, 96, 3)
    assert float(jnp.abs(y).max()) <= 1.0

    D = MultiscaleDiscriminator(ndf=8, n_layers=2, num_D=2)
    dv = D.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 96, 10)))
    preds = D.apply(dv, jnp.zeros((1, 64, 96, 10)))
    assert len(preds) == 2 and len(preds[0]) == 4  # n_layers+2 feature taps

    g_loss = gan_loss_lsgan(preds, True)
    fm = feature_matching_loss(preds, preds, num_D=2, n_layers=2)
    assert np.isfinite(float(g_loss)) and float(fm) == 0.0

    E = Encoder(feat_num=5, nef=4, n_downsampling=2)
    ev = E.init(jax.random.PRNGKey(2), jnp.zeros((1, 64, 96, 4)))
    f = E.apply(ev, jnp.zeros((1, 64, 96, 4)))
    assert f.shape == (1, 64, 96, 5)


def test_instance_average_pooling():
    from sdn3d_tpu.models.pix2pixhd import instance_average, \
        instance_feature_means
    feats = jnp.asarray(np.arange(16, dtype=np.float32).reshape(1, 4, 4, 1))
    inst = jnp.zeros((1, 4, 4), jnp.int32).at[0, :2].set(1)
    out = np.asarray(instance_average(feats, inst, max_instances=4))
    f = np.arange(16, dtype=np.float32).reshape(4, 4)
    np.testing.assert_allclose(out[0, :2, :, 0], f[:2].mean(), rtol=1e-6)
    np.testing.assert_allclose(out[0, 2:, :, 0], f[2:].mean(), rtol=1e-6)

    means, counts = instance_feature_means(feats, inst, max_instances=4)
    np.testing.assert_allclose(np.asarray(means)[0, 1, 0], f[:2].mean())
    assert np.asarray(counts)[0, 1] == 8 and np.asarray(counts)[0, 0] == 8


def test_get_edges():
    from sdn3d_tpu.models.pix2pixhd import get_edges
    inst = jnp.zeros((1, 4, 4), jnp.int32).at[0, :, 2:].set(7)
    e = np.asarray(get_edges(inst))[0, :, :, 0]
    assert e[:, 1].all() and e[:, 2].all()
    assert not e[:, 0].any() and not e[:, 3].any()


@pytest.mark.slow
def test_local_enhancer_forward():
    """LocalEnhancer (networks.py:156-208): coarse global trunk + enhancer
    branch, output is tanh RGB at input resolution."""
    import jax
    import jax.numpy as jnp
    from sdn3d_tpu.models.pix2pixhd import LocalEnhancer

    m = LocalEnhancer(output_nc=3, ngf=8, n_downsample_global=2,
                      n_blocks_global=2, n_local_enhancers=1,
                      n_blocks_local=1)
    x = jnp.ones((1, 64, 96, 7))
    y = m.init_with_output(jax.random.PRNGKey(0), x)[0]
    assert y.shape == (1, 64, 96, 3)
    assert float(jnp.abs(y).max()) <= 1.0


@pytest.mark.slow
def test_alternative_semantic_decoders():
    """C1BilinearDeepSup / PPMBilinear (models.py:251-355): train mode
    yields log-softmax (deep-sup tuple for C1-deepsup), inference yields
    upsampled softmax."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from sdn3d_tpu.models.semantic import C1BilinearDeepSup, PPMBilinear

    conv4 = jnp.ones((1, 8, 8, 1024))
    conv5 = jnp.ones((1, 8, 8, 2048))
    feats = [None, None, conv4, conv5]

    m = C1BilinearDeepSup(num_class=5)
    (x, d), _ = m.init_with_output(
        jax.random.PRNGKey(0), feats, train=True,
        method=lambda mdl, *a, **k: mdl(*a, **k))
    assert x.shape == (1, 8, 8, 5) and d.shape == (1, 8, 8, 5)
    np.testing.assert_allclose(np.exp(np.asarray(x)).sum(-1), 1.0,
                               rtol=1e-5)

    m2 = PPMBilinear(num_class=5)
    probs, _ = m2.init_with_output(jax.random.PRNGKey(0), feats,
                                   seg_size=(32, 32))
    assert probs.shape == (1, 32, 32, 5)
    np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, rtol=1e-5)


def test_get_points_from_angles():
    import numpy as np
    from sdn3d_tpu.geometry.camera import get_points_from_angles

    p = np.asarray(get_points_from_angles(2.0, 0.0, 0.0))
    np.testing.assert_allclose(p, [0.0, 0.0, -2.0], atol=1e-6)
    p = np.asarray(get_points_from_angles(2.0, 90.0, 0.0))
    np.testing.assert_allclose(p, [0.0, 2.0, 0.0], atol=1e-6)
    p = np.asarray(get_points_from_angles(
        np.asarray([1.0, 1.0]), np.asarray([0.0, 0.0]),
        np.asarray([90.0, 270.0])))
    np.testing.assert_allclose(p, [[1, 0, 0], [-1, 0, 0]], atol=1e-6)


def test_image_metrics():
    """l2/psnr/dssim (util2.py:48-59); ssim==1 for identical images and
    psnr is exact for a known uniform error."""
    import numpy as np
    from sdn3d_tpu.utils.metrics import dssim, l2, psnr, ssim

    rng = np.random.RandomState(0)
    a = rng.randint(0, 255, (32, 32, 3)).astype(np.float64)
    assert ssim(a, a) == 1.0
    assert dssim(a, a) == 0.0
    assert l2(a, a) == 0.0

    b = a + 10.0
    np.testing.assert_allclose(psnr(a, b), 10 * np.log10(255 ** 2 / 100),
                               rtol=1e-9)
    assert 0.0 < dssim(a, b) < 0.5
    np.testing.assert_allclose(l2(a, b), 0.5 * (10 / 255) ** 2, rtol=1e-9)


@pytest.mark.slow
def test_semantic_bfloat16_close_to_float32():
    """SemanticModel(dtype=bfloat16) shares float32 params and stays close
    to the float32 forward (BatchNorm stats and logits remain float32)."""
    import jax
    import jax.numpy as jnp
    from sdn3d_tpu.models.semantic import SemanticModel

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32))
    m32 = SemanticModel(num_class=5)
    m16 = SemanticModel(num_class=5, dtype=jnp.bfloat16)
    variables = m32.init(jax.random.PRNGKey(0), x, seg_size=(64, 96))
    p32 = m32.apply(variables, x, seg_size=(64, 96))
    p16 = m16.apply(variables, x, seg_size=(64, 96))
    assert p32.dtype == jnp.float32 and p16.dtype == jnp.float32
    # softmax probabilities agree to bf16-accumulation tolerance
    np.testing.assert_allclose(np.asarray(p16), np.asarray(p32), atol=0.08)
    assert np.mean(np.abs(np.asarray(p16) - np.asarray(p32))) < 0.01


@pytest.mark.slow
def test_pix2pixhd_bfloat16_close_to_float32():
    import jax
    import jax.numpy as jnp
    from sdn3d_tpu.models.pix2pixhd import GlobalGenerator

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 32, 64, 20).astype(np.float32))
    g32 = GlobalGenerator(ngf=8, n_downsampling=2, n_blocks=2)
    g16 = GlobalGenerator(ngf=8, n_downsampling=2, n_blocks=2,
                          dtype=jnp.bfloat16)
    variables = g32.init(jax.random.PRNGKey(0), x)
    y32 = g32.apply(variables, x)
    y16 = g16.apply(variables, x)
    assert y32.dtype == jnp.float32 and y16.dtype == jnp.float32
    # tanh output in [-1, 1]: absolute tolerance
    np.testing.assert_allclose(np.asarray(y16), np.asarray(y32), atol=0.1)
    assert np.mean(np.abs(np.asarray(y16) - np.asarray(y32))) < 0.02


@pytest.mark.slow
def test_maskrcnn_bfloat16_detections_close():
    """MaskRCNNConfig(compute_dtype='bfloat16') shares float32 params and
    produces near-identical proposal scores on a small config."""
    import jax
    import jax.numpy as jnp
    from sdn3d_tpu.models.maskrcnn import (MaskRCNN, MaskRCNNConfig,
                                           generate_pyramid_anchors)

    cfg32 = MaskRCNNConfig(image_max_dim=128, stage_sizes=(1, 1, 1, 1),
                           pre_nms_limit=200, post_nms_rois_inference=20,
                           detection_max_instances=5)
    cfg16 = dataclasses.replace(cfg32, compute_dtype="bfloat16")
    anchors = jnp.asarray(generate_pyramid_anchors(cfg32))
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(1, 128, 128, 3).astype(np.float32) * 50)
    m32, m16 = MaskRCNN(cfg32), MaskRCNN(cfg16)
    window = (0.0, 0.0, 128.0, 128.0)
    variables = m32.init(jax.random.PRNGKey(0), img, anchors, window)
    o32 = m32.apply(variables, img, anchors, window)
    o16 = m16.apply(variables, img, anchors, window)
    # logits are O(20) with this random init; bf16 rounding leaves ~1e-2
    # relative error — check the error distribution, not element-wise
    # bounds (near-zero logits have unbounded relative error).
    a16 = np.asarray(o16["rpn_class_logits"])
    a32 = np.asarray(o32["rpn_class_logits"])
    scale = np.abs(a32).mean()
    err = np.abs(a16 - a32)
    assert err.mean() / scale < 0.02, (err.mean(), scale)
    assert np.quantile(err, 0.99) / scale < 0.1
