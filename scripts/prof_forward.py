"""Decompose the forward rasterizer cost: pack_faces / kernel / unperm+finish."""
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
from sdn3d_tpu.ops import rasterize_pallas as RP
from sdn3d_tpu.render.renderer import _fill_back

SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 768
B = 16


def fence(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0])


def timeit(name, fn, *args, iters=3, vary=0):
    out = fn(*args)
    fence(out)
    t0 = time.perf_counter()
    for i in range(iters):
        a = list(args)
        if a[vary].dtype in (jnp.float32,):
            a[vary] = a[vary] + 1e-4 * (i + 1)
        out = fn(*a)
    fence(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:30s}: {dt*1e3:9.1f} ms")
    return dt


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

    def project(verts, thetas, trans):
        q = y_rotation_quaternion(thetas)
        vcam, _ = perspective_transform(
            verts, scales=jnp.ones((B, 3)), rotations=q, translations=trans,
            perspective_translations=trans, zoom_tos=jnp.full((B, 1), 0.5))
        vcam = vcam * jnp.asarray([-1.0, 1.0, 1.0])
        eye = jnp.zeros((B, 3))
        d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), (B, 3))
        up = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (B, 3))
        v = camera.look(vcam, eye, d, up)
        return camera.perspective_divide(v, 30.0)

    def fv_fn(verts, thetas, trans, faces_idx):
        v = project(verts, thetas, trans)
        ff, _ = _fill_back(faces_idx, None)
        return camera.vertices_to_faces(v, ff)

    fv = jax.block_until_ready(jax.jit(fv_fn)(verts, thetas, trans, faces_idx))
    print("faces:", fv.shape)

    timeit("project+gather (fv)", jax.jit(fv_fn), verts, thetas, trans,
           faces_idx)

    packed, aux, chunk_bbox, perm = jax.jit(
        lambda fv: RP.pack_faces(fv, None, SIZE, version=1))(fv)
    packed = jax.block_until_ready(packed)

    timeit("pack_faces (incl sort)", jax.jit(
        lambda fv: RP.pack_faces(fv, None, SIZE, version=1)), fv)
    timeit("pack_faces nosort", jax.jit(
        lambda fv: RP.pack_faces(fv, None, SIZE, sort=False, version=1)), fv)

    timeit("kernel only", lambda p: RP.rasterize_face_index_pallas(
        p, aux, chunk_bbox, SIZE, version=1), packed)

    def full(fv):
        fi, w, d, inv = R.rasterize_face_maps(
            fv, None, SIZE, return_face_inv=False, return_weights=False)
        return (fi >= 0).astype(jnp.float32), d
    timeit("full fwd (sil+depth maps)", jax.jit(full), fv)

    def full_unperm(fv):
        fi, _, d, _ = R.rasterize_face_maps(
            fv, None, SIZE, return_face_inv=False, return_weights=False)
        return fi, d
    timeit("full fwd (face idx out)", jax.jit(full_unperm), fv)


if __name__ == "__main__":
    main()
