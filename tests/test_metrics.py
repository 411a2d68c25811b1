"""Image-metric tests: l2/psnr/ssim/dssim sanity + an independent numpy
transcription of the LPIPS math (scaling layer -> VGG16 taps -> channel
unit-norm -> |lin| weighting -> spatial mean -> layer sum) used as an
oracle against the jax implementation."""

import numpy as np
import pytest

import jax

from sdn3d_tpu.utils import metrics


def test_l2_psnr_identity():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (32, 32, 3)).astype(np.float64)
    assert metrics.l2(img, img) == 0.0
    noisy = np.clip(img + rng.randn(32, 32, 3) * 10, 0, 255)
    assert metrics.l2(img, noisy) > 0
    assert metrics.psnr(img, noisy) < 40
    assert metrics.dssim(img, img) < 1e-9
    assert 0 < metrics.dssim(img, noisy) < 0.5


# ---------------------------------------------------------------------------
# LPIPS numpy oracle
# ---------------------------------------------------------------------------

_CFG16 = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
          512, 512, 512, "M", 512, 512, 512]
_TAPS16 = (1, 3, 6, 9, 12)
_SHIFT = np.array([-0.030, -0.088, -0.188])
_SCALE = np.array([0.458, 0.448, 0.450])


def _np_conv3x3(x, kernel, bias):
    """x [H, W, I], kernel [3, 3, I, O] (flax layout), pad 1."""
    H, W, I = x.shape
    xp = np.pad(x, ((1, 1), (1, 1), (0, 0)))
    cols = np.stack([xp[i:i + H, j:j + W] for i in range(3)
                     for j in range(3)], axis=2)        # [H, W, 9, I]
    k = kernel.reshape(9, I, -1)                         # [9, I, O]
    return np.einsum("hwki,kio->hwo", cols, k) + bias


def _np_lpips(params, x, y):
    """x, y [H, W, 3] in [-1, 1]; params from init_lpips()["params"]."""
    def features(img):
        t = (img - _SHIFT) / _SCALE
        taps = []
        ci = 0
        for c in _CFG16:
            if c == "M":
                H2, W2 = t.shape[0] // 2, t.shape[1] // 2
                t = t[:H2 * 2, :W2 * 2].reshape(H2, 2, W2, 2, -1).max((1, 3))
            else:
                p = params["net"][f"conv{ci}"]
                t = np.maximum(_np_conv3x3(t, np.asarray(p["kernel"]),
                                           np.asarray(p["bias"])), 0.0)
                if ci in _TAPS16:
                    taps.append(t)
                ci += 1
        return taps

    fx, fy = features(x), features(y)
    total = 0.0
    for i, (a, b) in enumerate(zip(fx, fy)):
        an = a / (np.sqrt((a ** 2).sum(-1, keepdims=True)) + 1e-10)
        bn = b / (np.sqrt((b ** 2).sum(-1, keepdims=True)) + 1e-10)
        w = np.abs(np.asarray(params[f"lin{i}"]))
        total += ((an - bn) ** 2 * w).sum(-1).mean()
    return total


@pytest.mark.slow
def test_lpips_vs_numpy_oracle():
    from sdn3d_tpu.models.lpips import init_lpips, lpips as lpips_fn

    variables = init_lpips(jax.random.PRNGKey(3))
    rng = np.random.RandomState(1)
    x = rng.rand(64, 64, 3).astype(np.float32) * 2 - 1
    y = rng.rand(64, 64, 3).astype(np.float32) * 2 - 1

    got = float(np.asarray(lpips_fn(variables, x[None], y[None]))[0])
    want = _np_lpips(jax.tree_util.tree_map(np.asarray,
                                            variables["params"]), x, y)
    np.testing.assert_allclose(got, want, rtol=2e-4)
    # identity -> 0; distance symmetric
    zero = float(np.asarray(lpips_fn(variables, x[None], x[None]))[0])
    assert abs(zero) < 1e-6
    sym = float(np.asarray(lpips_fn(variables, y[None], x[None]))[0])
    np.testing.assert_allclose(got, sym, rtol=1e-5)


def test_lpips_metric_wrapper():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (64, 64, 3)).astype(np.float32)
    noisy = np.clip(img + rng.randn(64, 64, 3) * 25, 0, 255)
    d0 = metrics.lpips(img, img)
    d1 = metrics.lpips(img, noisy)
    assert abs(d0) < 1e-6
    assert d1 > 0


def test_port_lpips_layout():
    """port_lpips maps a torch-layout dict onto the flax tree (random
    weights; layout + shapes are what is being pinned)."""
    import torch

    from sdn3d_tpu.models.lpips import TAP_CHANNELS, init_lpips
    from sdn3d_tpu.utils.port import port_lpips

    conv_feature_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    chans = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512]
    sd = {}
    in_c = 3
    for fi, c in zip(conv_feature_idx, chans):
        sd[f"features.{fi}.weight"] = torch.randn(c, in_c, 3, 3)
        sd[f"features.{fi}.bias"] = torch.randn(c)
        in_c = c
    for k, c in enumerate(TAP_CHANNELS):
        sd[f"lin{k}.model.1.weight"] = torch.rand(1, c, 1, 1)

    variables = port_lpips(sd)
    template = init_lpips()["params"]
    got = jax.tree_util.tree_map(np.shape, variables["params"])
    want = jax.tree_util.tree_map(np.shape, template)
    assert got == want


def test_flops_mfu_row_math():
    """utils/flops.py: cost extraction + roofline row arithmetic (the
    columns every r5 benchmark artifact carries)."""
    import jax
    import jax.numpy as jnp

    from sdn3d_tpu.utils.flops import (compiled_costs, device_peaks,
                                       mfu_row)

    a = jnp.ones((128, 128))
    compiled = jax.jit(lambda x: (x @ x).sum()).lower(a).compile()
    costs = compiled_costs(compiled)
    # 128^3 * 2 matmul flops plus the reduction
    assert costs["flops"] >= 2 * 128 ** 3
    assert costs["bytes"] > 0

    row = mfu_row(1e12, 1e9, 1.0)
    assert row["tflops_per_s"] == 1.0
    peaks = device_peaks()
    if peaks:   # known device kind (TPU); CPU test runs skip the pcts
        pf, pb = peaks
        assert abs(row["pct_peak_flops"] - 100e12 / pf) < 1e-6
        assert row["bound"] in ("mxu", "hbm<=")
    # no-time row carries only the raw counters
    row0 = mfu_row(5.0, 7.0, 0.0)
    assert row0 == {"flops": 5.0, "hlo_bytes_accessed": 7.0}
