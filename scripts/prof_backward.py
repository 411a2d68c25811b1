"""Profile the silhouette-backward decomposition on the real TPU.

Stages (cumulative, so deltas isolate each VJP hop):
  fwd       rasterize_silhouettes forward only
  gradF     grad wrt projected face_verts   (custom VJP: pixgrad + pix->face scatter)
  gradV     grad wrt vertices               (+ vertices_to_faces scatter)
  step      full DerenderTrainer train step (16 objects, full mode)

Run: python scripts/prof_backward.py [size] [walk]
"""
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
from sdn3d_tpu.render.renderer import _fill_back

SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 512
WALK = int(sys.argv[2]) if len(sys.argv) > 2 else 64
B = 16


def fence(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0])


def timeit(fn, *args, iters=3, vary=None):
    out = fn(*args)
    fence(out)
    t0 = time.perf_counter()
    for i in range(iters):
        a = list(args)
        if vary is not None:
            a[vary] = a[vary] + 1e-4 * (i + 1)
        out = fn(*a)
    fence(out)
    return (time.perf_counter() - t0) / iters


def main():
    bank = load_shapenet_bank("/root/reference/geometric/assets")
    nv, nf = int(bank.num_vertices[0]), int(bank.num_faces[0])
    verts_np = bank.vertices[0, :nv]
    faces_np = bank.faces[0, :nf]
    rng = np.random.RandomState(0)

    verts = jnp.asarray(np.repeat(verts_np[None], B, 0))
    faces_idx = jnp.asarray(np.repeat(faces_np[None], B, 0))
    thetas = jnp.asarray(rng.uniform(-np.pi, np.pi, B).astype(np.float32))
    trans = jnp.asarray(np.stack(
        [rng.uniform(-1, 1, B), rng.uniform(-0.5, 0.5, B),
         -rng.uniform(5, 12, B)], 1).astype(np.float32))

    def project(verts, faces_idx, thetas, trans):
        q = y_rotation_quaternion(thetas)
        vcam, _ = perspective_transform(
            verts, scales=jnp.ones((B, 3)), rotations=q, translations=trans,
            perspective_translations=trans, zoom_tos=jnp.full((B, 1), 0.5))
        vcam = vcam * jnp.asarray([-1.0, 1.0, 1.0])
        f2, _ = _fill_back(faces_idx, None)
        eye = jnp.zeros((B, 3))
        d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), (B, 3))
        up = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (B, 3))
        v = camera.look(vcam, eye, d, up)
        v = camera.perspective_divide(v, 30.0)
        return v, f2

    # materialize projected faces once (fixed input for fwd/gradF)
    vproj, f2 = jax.jit(project)(verts, faces_idx, thetas, trans)
    fv = jax.jit(camera.vertices_to_faces)(vproj, f2)
    fv = jax.block_until_ready(fv)

    sil = lambda fv: R.rasterize_silhouettes(
        fv, None, SIZE, anti_aliasing=False, grad_walk=WALK).sum()

    t_fwd = timeit(jax.jit(lambda fv: R.rasterize_silhouettes(
        fv, None, SIZE, anti_aliasing=False)), fv, vary=0)
    print(f"fwd   {SIZE}^2 x{B}: {t_fwd*1e3:9.1f} ms")

    t_gradF = timeit(jax.jit(jax.grad(sil)), fv, vary=0)
    print(f"gradF {SIZE}^2 x{B}: {t_gradF*1e3:9.1f} ms  (pixgrad+pix2face)")

    def loss_v(vproj):
        return sil(camera.vertices_to_faces(vproj, f2))
    t_gradV = timeit(jax.jit(jax.grad(loss_v)), vproj, vary=0)
    print(f"gradV {SIZE}^2 x{B}: {t_gradV*1e3:9.1f} ms  (+face2vert)")

    def loss_full(verts, thetas, trans):
        v, f2_ = project(verts, faces_idx, thetas, trans)
        return sil(camera.vertices_to_faces(v, f2_))
    t_gradA = timeit(jax.jit(jax.grad(loss_full, argnums=(0, 1, 2))),
                     verts, thetas, trans, vary=1)
    print(f"gradA {SIZE}^2 x{B}: {t_gradA*1e3:9.1f} ms  (+transforms)")


if __name__ == "__main__":
    main()
