"""Stage profile of render_targets (the bench.py hot path) at 256^2 AA."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from sdn3d_tpu.geometry.assets import load_shapenet_bank
from sdn3d_tpu.geometry.transforms import (perspective_transform,
                                           y_rotation_quaternion)
from sdn3d_tpu.geometry import camera
from sdn3d_tpu.ops import rasterize as R
from sdn3d_tpu.render import render_targets
from sdn3d_tpu.render.renderer import _fill_back

B = 16
IMG = int(sys.argv[1]) if len(sys.argv) > 1 else 256   # AA -> 2x raster


def fence(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0])


def timeit(name, fn, *args, iters=6, vary=0):
    out = fn(*args)
    fence(out)
    t0 = time.perf_counter()
    for i in range(iters):
        a = list(args)
        a[vary] = a[vary] + 1e-5 * (i + 1)
        out = fn(*a)
    fence(out)
    print(f"{name:30s}: {(time.perf_counter()-t0)/iters*1e3:9.1f} ms")


def main():
    bank = load_shapenet_bank("/root/reference/geometric/assets")
    nv, nf = int(bank.num_vertices[0]), int(bank.num_faces[0])
    rng = np.random.RandomState(0)
    verts = jnp.asarray(np.repeat(bank.vertices[0, :nv][None], B, 0))
    faces_idx = jnp.asarray(np.repeat(bank.faces[0, :nf][None], B, 0))
    thetas = jnp.asarray(rng.uniform(-np.pi, np.pi, B).astype(np.float32))
    trans = jnp.asarray(np.stack(
        [rng.uniform(-1, 1, B), rng.uniform(-0.5, 0.5, B),
         -rng.uniform(5, 12, B)], 1).astype(np.float32))

    def vcam_fn(verts, thetas):
        q = y_rotation_quaternion(thetas)
        vcam, _ = perspective_transform(
            verts, scales=jnp.ones((B, 3)), rotations=q, translations=trans,
            perspective_translations=trans, zoom_tos=jnp.full((B, 1), 0.5))
        return vcam

    vcam = jax.block_until_ready(jax.jit(vcam_fn)(verts, thetas))

    def full(vcam, faces_idx):
        return render_targets(vcam, faces_idx,
                              ("silhouette", "normal", "depth"),
                              image_size=IMG)
    timeit("render_targets s+n+d", jax.jit(full), vcam, faces_idx)

    def sil_only(vcam, faces_idx):
        return render_targets(vcam, faces_idx, ("silhouette",),
                              image_size=IMG)
    timeit("render_targets sil", jax.jit(sil_only), vcam, faces_idx)

    def sil_dep(vcam, faces_idx):
        return render_targets(vcam, faces_idx, ("silhouette", "depth"),
                              image_size=IMG)
    timeit("render_targets sil+dep", jax.jit(sil_dep), vcam, faces_idx)

    # raw maps (no finish/unperm)
    size = IMG * 2

    def raw(vcam, faces_idx):
        v = vcam * jnp.asarray([-1.0, 1.0, 1.0])
        ff, _ = _fill_back(faces_idx, None)
        eye = jnp.zeros((B, 3))
        d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), (B, 3))
        up = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (B, 3))
        v = camera.look(v, eye, d, up)
        v = camera.perspective_divide(v, 30.0)
        fv = camera.vertices_to_faces(v, ff)
        fi, depth, perm = R._rasterize_sorted(fv, jnp.ones(ff.shape[:2], bool),
                                              size, 0.1, 100.0)
        return (fi >= 0).astype(jnp.float32).sum(), perm.sum()
    timeit("raw sorted fi (no unperm)", jax.jit(raw), vcam, faces_idx)


if __name__ == "__main__":
    main()
