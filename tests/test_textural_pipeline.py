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


def test_encode_input_shapes(cfg_batch):
    trainer, batch = cfg_batch
    x = encode_input(trainer.cfg, batch["label"], batch["inst"])
    assert x.shape == (1, 48, 64, 15)
    # one-hot sums to 1 on the label block
    np.testing.assert_allclose(np.asarray(x[..., :14]).sum(-1), 1.0)
