"""Rasterizer parity tests against the loop-based numpy oracle
(reference semantics: geometric/neural_renderer/rasterize.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sdn3d_tpu.ops import rasterize as R
from tests import nmr_oracle as oracle


def random_faces(rng, batch=2, num_faces=12, z_range=(1.5, 6.0)):
    """Random triangles in front of the camera, normalized coords."""
    xy = rng.uniform(-1.2, 1.2, size=(batch, num_faces, 3, 2))
    z = rng.uniform(*z_range, size=(batch, num_faces, 3, 1))
    return np.concatenate([xy, z], axis=-1).astype(np.float32)


@pytest.fixture(scope="module")
def rng():
    return np.random.RandomState(0)


def test_forward_matches_oracle(rng):
    faces = random_faces(rng)
    isz = 24
    fi, w, d, inv = jax.jit(
        lambda f: R.rasterize_face_maps(f, None, isz))(jnp.asarray(faces))
    fi_o, w_o, d_o, inv_o = oracle.forward_maps(faces, image_size=isz)

    np.testing.assert_array_equal(np.asarray(fi), fi_o)
    hit = fi_o >= 0
    np.testing.assert_allclose(np.asarray(d)[hit], d_o[hit], rtol=1e-4)
    np.testing.assert_allclose(np.asarray(w)[hit], w_o[hit], atol=1e-4)
    np.testing.assert_allclose(np.asarray(inv)[hit], inv_o[hit],
                               rtol=1e-3, atol=1e-4)


def test_forward_face_valid_mask(rng):
    faces = random_faces(rng, batch=1, num_faces=6)
    isz = 16
    valid = np.array([[True, False, True, True, False, True]])
    fi, _, _, _ = R.rasterize_face_maps(jnp.asarray(faces),
                                        jnp.asarray(valid), isz)
    fi_o, _, _, _ = oracle.forward_maps(faces, valid, image_size=isz)
    np.testing.assert_array_equal(np.asarray(fi), fi_o)


def test_silhouette_backward_matches_oracle(rng):
    faces = random_faces(rng, batch=1, num_faces=5)
    isz = 16
    g_rng = np.random.RandomState(1)
    cot = g_rng.randn(1, isz, isz).astype(np.float32)

    sil = R._make_silhouette_fn(isz, R.DEFAULT_NEAR, R.DEFAULT_FAR,
                                R.DEFAULT_EPS)
    valid = jnp.ones((1, 5), bool)
    alpha, vjp = jax.vjp(lambda f: sil(f, valid), jnp.asarray(faces))
    (gf,) = vjp(jnp.asarray(cot))

    fi_o, _, _, _ = oracle.forward_maps(faces, image_size=isz)
    alpha_o = (fi_o >= 0).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(alpha), alpha_o)

    gf_o = oracle.silhouette_backward(faces, fi_o, alpha_o, cot,
                                      image_size=isz, eps=R.DEFAULT_EPS)
    np.testing.assert_allclose(np.asarray(gf), gf_o, rtol=1e-3, atol=1e-3)


def test_depth_backward_matches_oracle(rng):
    faces = random_faces(rng, batch=2, num_faces=6)
    isz = 16
    g_rng = np.random.RandomState(2)
    cot = g_rng.randn(2, isz, isz).astype(np.float32)

    dep = R._make_depth_fn(isz, R.DEFAULT_NEAR, R.DEFAULT_FAR)
    valid = jnp.ones((2, 6), bool)
    d, vjp = jax.vjp(lambda f: dep(f, valid), jnp.asarray(faces))
    (gf,) = vjp(jnp.asarray(cot))

    fi_o, w_o, d_o, inv_o = oracle.forward_maps(faces, image_size=isz)
    gf_o = oracle.depth_backward(faces, fi_o, d_o, w_o, inv_o, cot,
                                 image_size=isz)
    np.testing.assert_allclose(np.asarray(gf), gf_o, rtol=1e-3, atol=1e-3)


def test_depth_gradient_finite_difference():
    """Analytic z-gradient matches finite differences for a stable pixel set."""
    faces = np.array([[[[-0.8, -0.8, 3.0],
                        [0.8, -0.6, 3.5],
                        [0.0, 0.9, 4.0]]]], np.float32)
    isz = 32

    def loss(f):
        d = R.rasterize_depth(f, image_size=isz, anti_aliasing=False)
        return jnp.sum(jnp.where(d < 90.0, d, 0.0))

    g = jax.grad(loss)(jnp.asarray(faces))
    eps = 1e-3
    for k in range(3):
        fp = faces.copy()
        fp[0, 0, k, 2] += eps
        fm = faces.copy()
        fm[0, 0, k, 2] -= eps
        fd = (loss(jnp.asarray(fp)) - loss(jnp.asarray(fm))) / (2 * eps)
        np.testing.assert_allclose(np.asarray(g)[0, 0, k, 2], fd,
                                   rtol=2e-2, atol=1e-2)


def test_silhouette_optimization_converges():
    """The approximate gradient must drive vertices toward a target mask
    (the de-facto validation loop, geometric/scripts/main.py:405-459)."""
    import optax

    isz = 32
    target_faces = jnp.array([[[[-0.5, -0.5, 3.0],
                                [0.6, -0.4, 3.0],
                                [0.0, 0.7, 3.0]]]], jnp.float32)
    target = R.rasterize_silhouettes(target_faces, image_size=isz,
                                     anti_aliasing=False)

    init = jnp.array([[[[-0.2, -0.1, 3.0],
                        [0.8, -0.1, 3.0],
                        [0.3, 0.9, 3.0]]]], jnp.float32)

    def loss_fn(f):
        a = R.rasterize_silhouettes(f, image_size=isz, anti_aliasing=False)
        return jnp.mean((a - target) ** 2)

    opt = optax.adam(2e-2)
    state = opt.init(init)
    f = init
    loss0 = float(loss_fn(f))

    @jax.jit
    def step(f, state):
        l, g = jax.value_and_grad(loss_fn)(f)
        updates, state = opt.update(g, state)
        return optax.apply_updates(f, updates), state, l

    for _ in range(60):
        f, state, l = step(f, state)
    assert float(l) < 0.35 * loss0, (loss0, float(l))


def test_aa_and_flip_orientation():
    """AA output is image_size; a triangle in the +y half-plane lands in the
    upper image rows after the vertical flip (rasterize.py:951-957)."""
    faces = jnp.array([[[[-0.5, 0.2, 3.0],
                         [0.5, 0.2, 3.0],
                         [0.0, 0.8, 3.0]]]], jnp.float32)
    a = R.rasterize_silhouettes(faces, image_size=32, anti_aliasing=True)
    assert a.shape == (1, 32, 32)
    upper = np.asarray(a)[0, :16].sum()
    lower = np.asarray(a)[0, 16:].sum()
    assert upper > 0 and lower == 0


def test_face_colors_render():
    faces = jnp.array([[[[-0.5, -0.5, 3.0],
                         [0.5, -0.5, 3.0],
                         [0.0, 0.5, 3.0]]]], jnp.float32)
    colors = jnp.array([[[0.25, 0.5, 0.75]]], jnp.float32)
    rgb = R.rasterize_face_colors(faces, colors, image_size=16,
                                  anti_aliasing=False,
                                  background=(1.0, 1.0, 1.0))
    rgb = np.asarray(rgb)
    assert rgb.shape == (1, 3, 16, 16)
    # center pixel is covered
    assert np.allclose(rgb[0, :, 8, 8], [0.25, 0.5, 0.75], atol=1e-5)
    # corner is background
    assert np.allclose(rgb[0, :, 0, 0], 1.0)


def test_kernel_version_per_call(rng):
    """The per-call `version` override (parity mode) selects the kernel
    without touching the env/module default: version=1 must be bit-exact
    vs the XLA scan on the hit map."""
    faces = random_faces(rng, batch=1, num_faces=23, z_range=(1.5, 6.0))
    valid = np.ones((1, 23), bool)
    fi_x, _, _, _ = R.rasterize_face_maps(
        jnp.asarray(faces), jnp.asarray(valid), 128, impl="xla")
    for v in (1, 3):
        fi_p, _, _, _ = R.rasterize_face_maps(
            jnp.asarray(faces), jnp.asarray(valid), 128,
            impl="pallas_interp", version=v)
        np.testing.assert_array_equal(np.asarray(fi_p), np.asarray(fi_x))


@pytest.mark.parametrize("version", [1, 2, 3])
def test_pallas_kernel_matches_xla(rng, version, monkeypatch):
    """Both tiled Pallas kernels (interpret mode on CPU) must produce the
    same face-index/weight/depth maps as the portable XLA scan."""
    from sdn3d_tpu.ops import rasterize_pallas as RP
    monkeypatch.setattr(RP, "KERNEL_VERSION", version)

    faces = random_faces(rng, batch=2, num_faces=37, z_range=(1.5, 6.0))
    isz = 128  # minimum tile-aligned size (TILE_H=64, TILE_W=128)
    valid = np.ones((2, 37), bool)
    valid[0, 5] = valid[1, 11] = False
    fi_x, w_x, d_x, _ = R.rasterize_face_maps(
        jnp.asarray(faces), jnp.asarray(valid), isz, impl="xla")
    fi_p, w_p, d_p, _ = R.rasterize_face_maps(
        jnp.asarray(faces), jnp.asarray(valid), isz, impl="pallas_interp")
    np.testing.assert_array_equal(np.asarray(fi_p), np.asarray(fi_x))
    hit = np.asarray(fi_x) >= 0
    # rtol matches the oracle test: the kernels interpolate 1/z, rounding
    # differs from the XLA path's w-weighted form in the last ~2 ulps.
    np.testing.assert_allclose(np.asarray(d_p)[hit], np.asarray(d_x)[hit],
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(w_p)[hit], np.asarray(w_x)[hit],
                               atol=1e-5)


def test_silhouette_backward_pixelwise_vs_facewise():
    """The pixel-parallel backward must equal the face-chunk dense variant
    (both re-express rasterize.py:514-745).

    Own seeded RNG, not the shared module fixture: the two variants differ
    by float reassociation, and on some draws the 1e-3 tolerance is
    marginal — the shared RNG made pass/fail depend on which other tests
    ran first (caught by a `-k` subset run)."""
    faces = random_faces(np.random.RandomState(17), batch=2, num_faces=7)
    isz = 20
    g_rng = np.random.RandomState(5)
    cot = jnp.asarray(g_rng.randn(2, isz, isz).astype(np.float32))
    valid = jnp.ones((2, 7), bool)
    fi, _, _, _ = R.rasterize_face_maps(faces, valid, isz, impl="xla")
    alpha = (fi >= 0).astype(jnp.float32)
    g1 = R._silhouette_grad(jnp.asarray(faces), valid, fi, alpha, cot,
                            isz, R.DEFAULT_EPS)
    g2 = R._silhouette_grad_pixelwise(jnp.asarray(faces), valid, fi, alpha,
                                      cot, isz, R.DEFAULT_EPS)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), rtol=1e-3,
                               atol=1e-3)


def test_silhouette_backward_windowed_walk(rng):
    """A bounded out-walk approximates the exact gradient (1/dist decay)."""
    faces = random_faces(rng, batch=1, num_faces=4)
    isz = 24
    cot = jnp.asarray(np.random.RandomState(6).randn(1, isz, isz)
                      .astype(np.float32))
    valid = jnp.ones((1, 4), bool)
    fi, _, _, _ = R.rasterize_face_maps(faces, valid, isz, impl="xla")
    alpha = (fi >= 0).astype(jnp.float32)
    g_exact = R._silhouette_grad_pixelwise(jnp.asarray(faces), valid, fi,
                                           alpha, cot, isz, R.DEFAULT_EPS)
    g_win = R._silhouette_grad_pixelwise(jnp.asarray(faces), valid, fi,
                                         alpha, cot, isz, R.DEFAULT_EPS,
                                         walk=8)
    # same sign structure and dominated by the same terms
    num = float(jnp.sum(jnp.abs(g_win - g_exact)))
    den = float(jnp.sum(jnp.abs(g_exact))) + 1e-8
    assert num / den < 0.5, num / den


def test_segment_face_grads_pallas_matches_segment_sum(rng):
    """The one-hot-matmul pixel->face reduction kernel (interpret mode)
    must equal jax.ops.segment_sum over the face-index map."""
    from sdn3d_tpu.ops import rasterize_pallas as RP

    B, F, isz = 2, 53, 128
    faces = random_faces(rng, batch=B, num_faces=F, z_range=(1.5, 6.0))
    fi, _, _, _ = R.rasterize_face_maps(
        jnp.asarray(faces), None, isz, impl="xla")
    acc8 = jnp.asarray(rng.randn(B, 8, isz, isz).astype(np.float32))
    acc8 = acc8.at[:, 6:].set(0.0)

    aux, cb = RP.pack_seg_aux(jnp.asarray(faces), isz)
    out = RP.segment_face_grads_pallas(acc8, fi, aux, cb, isz,
                                       interpret=True)

    hit = np.asarray(fi) >= 0
    fi_c = np.where(hit, np.asarray(fi), 0)
    seg = (fi_c + np.arange(B)[:, None, None] * F).reshape(-1)
    for p in range(6):
        vals = np.where(hit, np.asarray(acc8)[:, p], 0.0).reshape(-1)
        ref = np.zeros(B * F, np.float32)
        np.add.at(ref, seg, vals)
        got = np.asarray(out)[:, :F, p].reshape(-1)
        # summation order differs (per-row MXU dots vs np.add.at)
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_pallas_v3_empty_scene_and_odd_size(rng, monkeypatch):
    """v3 kernel: fully-invalid scenes produce empty maps, and image sizes
    where tile_h < image (384 -> tile_h 192 with the default cap) still
    match the XLA scan."""
    from sdn3d_tpu.ops import rasterize_pallas as RP
    monkeypatch.setattr(RP, "KERNEL_VERSION", 3)

    faces = random_faces(rng, batch=1, num_faces=11)
    # all faces invalid
    valid = np.zeros((1, 11), bool)
    fi, _, d, _ = R.rasterize_face_maps(
        jnp.asarray(faces), jnp.asarray(valid), 128, impl="pallas_interp")
    assert (np.asarray(fi) == -1).all()
    np.testing.assert_allclose(np.asarray(d), 100.0)

    # 384 is not divisible by the 1024-capped tile height -> _tile_h
    # falls back to a divisor (192); maps must still match XLA.
    monkeypatch.setattr(RP, "TILE_H3", 1024)
    valid = np.ones((1, 11), bool)
    fi_x, _, d_x, _ = R.rasterize_face_maps(
        jnp.asarray(faces), jnp.asarray(valid), 384, impl="xla")
    fi_p, _, d_p, _ = R.rasterize_face_maps(
        jnp.asarray(faces), jnp.asarray(valid), 384, impl="pallas_interp")
    np.testing.assert_array_equal(np.asarray(fi_p), np.asarray(fi_x))
    hit = np.asarray(fi_x) >= 0
    np.testing.assert_allclose(np.asarray(d_p)[hit], np.asarray(d_x)[hit],
                               rtol=1e-4)


def test_v3_with_color_matches_gather(rng):
    """The v3 kernel's fused flat-color plane (10-bit packed) must match
    the portable colors[face_index] gather to quantization tolerance."""
    from sdn3d_tpu.ops import rasterize_pallas as RP

    faces = random_faces(rng, batch=2, num_faces=37, z_range=(1.5, 6.0))
    valid = np.ones((2, 37), bool)
    colors = rng.uniform(-1, 1, (2, 37, 3)).astype(np.float32)
    isz = 128

    packed, aux, cb, perm = RP.pack_faces(
        jnp.asarray(faces), jnp.asarray(valid), isz, version=3,
        colors=jnp.asarray(colors))
    fi, depth, rgb = RP.rasterize_face_index_pallas(
        packed, aux, cb, isz, interpret=True, version=3, with_color=True)

    want = R._gather_face_colors(fi, jnp.asarray(colors), perm)
    np.testing.assert_allclose(np.asarray(rgb),
                               np.asarray(want).transpose(0, 3, 1, 2),
                               atol=2.5 / 511.5)
    # background exactly 0
    bg = np.asarray(fi) < 0                                  # [B, H, W]
    rgb_hwc = np.asarray(rgb).transpose(0, 2, 3, 1)
    assert (rgb_hwc[bg] == 0).all()


def test_pallas_walk_matches_xla_loop(rng):
    """The halo-read Pallas walk kernel (interpret mode) must produce the
    same silhouette gradient as the XLA fori+roll loop — same invariant
    math, same gates, both windowed at the same walk."""
    faces = random_faces(rng, batch=2, num_faces=19, z_range=(1.5, 6.0))
    isz = 128
    valid = jnp.ones((2, 19), bool)
    fi, _, _, _ = R.rasterize_face_maps(jnp.asarray(faces),
                                        valid, isz, impl="xla")
    alpha = (np.asarray(fi) >= 0).astype(np.float32)
    g_rng = np.random.RandomState(1)
    cot = g_rng.randn(2, isz, isz).astype(np.float32)

    kw = dict(image_size=isz, eps=R.DEFAULT_EPS, walk=24)
    want = R._silhouette_grad_pixelwise(
        jnp.asarray(faces), valid, fi, jnp.asarray(alpha),
        jnp.asarray(cot), force_walk_impl="xla", **kw)
    got = R._silhouette_grad_pixelwise(
        jnp.asarray(faces), valid, fi, jnp.asarray(alpha),
        jnp.asarray(cot), force_walk_impl="pallas", **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_render_targets_matches_render(rng):
    """render_targets' fused single-gather camera path (fixed derender3d
    camera folded to diag(1,1,-1), per-face perspective, winding-reversal
    fill_back) must match the generic render() per-type path exactly."""
    from sdn3d_tpu.render import render, render_targets, RenderType

    b_rng = np.random.RandomState(7)
    verts = b_rng.uniform(-1, 1, (2, 20, 3)).astype(np.float32)
    verts[..., 2] -= 4.0                                   # in front of cam
    faces_idx = b_rng.randint(0, 20, (2, 11, 3)).astype(np.int32)

    maps = render_targets(jnp.asarray(verts), jnp.asarray(faces_idx),
                          ("silhouette", "normal", "depth"), image_size=64)
    sil = render(jnp.asarray(verts), jnp.asarray(faces_idx),
                 RenderType.Silhouette, image_size=64)
    dep = render(jnp.asarray(verts), jnp.asarray(faces_idx),
                 RenderType.Depth, image_size=64)
    nrm = render(jnp.asarray(verts), jnp.asarray(faces_idx),
                 RenderType.Normal, image_size=64)
    np.testing.assert_allclose(np.asarray(maps["silhouette"]),
                               np.asarray(sil), atol=1e-6)
    np.testing.assert_allclose(np.asarray(maps["depth"]),
                               np.asarray(dep), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(maps["normal"]),
                               np.asarray(nrm), rtol=2e-4, atol=2e-3)
