"""Texture-cube sampling + lighting tests (NR-3/NR-5/NR-8, lighting.py)."""

import numpy as np

import jax
import jax.numpy as jnp

from sdn3d_tpu.ops import rasterize as R
from sdn3d_tpu.ops.textures import lighting, sample_textures
from tests import nmr_oracle as oracle
from tests.test_rasterize import random_faces


def test_texture_sampling_matches_oracle():
    rng = np.random.RandomState(0)
    B, F, ts, isz = 1, 6, 4, 16
    faces = random_faces(rng, batch=B, num_faces=F, z_range=(2.0, 4.0))
    textures = rng.rand(B, F, ts, ts, ts, 3).astype(np.float32)

    fi, w, d, _ = oracle.forward_maps(faces, image_size=isz)
    got = sample_textures(jnp.asarray(faces), jnp.asarray(textures),
                          jnp.asarray(fi), jnp.asarray(w), jnp.asarray(d))
    want = oracle.texture_sampling(faces, textures, fi, w, d)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_texture_gradient_flows_to_textures():
    rng = np.random.RandomState(1)
    faces = random_faces(rng, batch=1, num_faces=3, z_range=(2.0, 4.0))
    textures = jnp.asarray(rng.rand(1, 3, 2, 2, 2, 3).astype(np.float32))

    def f(tex):
        out = R.rasterize_rgbad(jnp.asarray(faces), tex, image_size=16,
                                anti_aliasing=False, return_depth=False)
        return out["rgb"].sum()

    g = jax.grad(f)(textures)
    assert float(jnp.abs(g).sum()) > 0


def test_lighting():
    # one upward-facing face lit from above, one downward-facing
    faces = jnp.asarray([[
        [[0, 0, 0], [1, 0, 0], [1, 0, 1]],   # cross(v0-v1, v2-v1) -> +y
        [[0, 0, 0], [1, 0, 1], [1, 0, 0]],   # -> -y
    ]], jnp.float32)
    tex = jnp.ones((1, 2, 2, 2, 2, 3))
    lit = lighting(faces, tex, intensity_ambient=0.5,
                   intensity_directional=0.5, direction=(0, 1, 0))
    lit = np.asarray(lit)
    np.testing.assert_allclose(lit[0, 0], 1.0, rtol=1e-5)   # 0.5 + 0.5*cos(0)
    np.testing.assert_allclose(lit[0, 1], 0.5, rtol=1e-5)   # ambient only


def test_render_rgb_with_textures():
    from sdn3d_tpu.render import RenderType, render
    rng = np.random.RandomState(2)
    verts = jnp.asarray(rng.uniform(-0.4, 0.4, (1, 8, 3)).astype(np.float32))
    verts = verts.at[..., 2].add(-4.0)
    faces = jnp.asarray(rng.randint(0, 8, (1, 6, 3)).astype(np.int32))
    textures = jnp.asarray(np.full((1, 6, 2, 2, 2, 3), 0.8, np.float32))
    rgb = render(verts, faces, RenderType.RGB, image_size=32,
                 textures=textures)
    assert rgb.shape == (1, 3, 32, 32)
    assert np.isfinite(np.asarray(rgb)).all()
