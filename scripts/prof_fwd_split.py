"""Cumulative-stage split of the forward bench path, all outputs scalarized
in-jit (standalone big-output timings through the dev relay are
transfer-dominated and meaningless).

 A geom            : camera + fill_back + vertices_to_faces (+ normals)
 B A+pack          : + pack_faces (Morton sort + bbox/aux packing)
 C B+kernel        : + v3 raster kernel (with color plane)
 D full            : render_targets silhouette+normal+depth (incl. finish)
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
from sdn3d_tpu.ops import rasterize_pallas as RP
from sdn3d_tpu.render import render_targets
from sdn3d_tpu.render.renderer import _fill_back

B = 16
IMG = int(sys.argv[1]) if len(sys.argv) > 1 else 256
SIZE = IMG * 2


def fence(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0])


def timeit(name, fn, *args, iters=6):
    out = fn(*args)
    fence(out)
    t0 = time.perf_counter()
    for i in range(iters):
        a = list(args)
        a[0] = a[0] + 1e-5 * (i + 1)
        out = fn(*a)
    fence(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:26s}: {dt:9.1f} ms")
    return dt


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

    def vcam_fn(verts):
        q = y_rotation_quaternion(thetas)
        vcam, _ = perspective_transform(
            verts, scales=jnp.ones((B, 3)), rotations=q, translations=trans,
            perspective_translations=trans, zoom_tos=jnp.full((B, 1), 0.5))
        return vcam

    vcam = jax.block_until_ready(jax.jit(vcam_fn)(verts))

    def geom(vcam, faces_idx):
        v = vcam * jnp.asarray([-1.0, 1.0, 1.0])
        ff, _ = _fill_back(faces_idx, None)
        fv0 = camera.vertices_to_faces(v, ff)
        colors = camera.face_normals(fv0)
        eye = jnp.zeros((B, 3))
        d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), (B, 3))
        up = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (B, 3))
        v = camera.look(v, eye, d, up)
        v = camera.perspective_divide(v, 30.0)
        fv = camera.vertices_to_faces(v, ff)
        return fv, colors

    def a_fn(vcam, faces_idx):
        fv, colors = geom(vcam, faces_idx)
        return fv.sum() + colors.sum()
    timeit("A geom", jax.jit(a_fn), vcam, faces_idx)

    def b_fn(vcam, faces_idx):
        fv, colors = geom(vcam, faces_idx)
        packed, aux, cb, perm = RP.pack_faces(fv, None, SIZE, version=3,
                                              colors=colors)
        return packed.sum() + aux.sum() + cb.sum() + perm.sum()
    timeit("B geom+pack", jax.jit(b_fn), vcam, faces_idx)

    def b2_fn(vcam, faces_idx):
        fv, colors = geom(vcam, faces_idx)
        packed, aux, cb, perm = RP.pack_faces(fv, None, SIZE, version=3,
                                              colors=colors, sort=False)
        return packed.sum() + aux.sum() + cb.sum()
    timeit("B' geom+pack nosort", jax.jit(b2_fn), vcam, faces_idx)

    def c_fn(vcam, faces_idx):
        fv, colors = geom(vcam, faces_idx)
        packed, aux, cb, perm = RP.pack_faces(fv, None, SIZE, version=3,
                                              colors=colors)
        fi, d, rgb = RP.rasterize_face_index_pallas(
            packed, aux, cb, SIZE, version=3, with_color=True)
        return fi.sum() + d.sum() + rgb.sum() + perm.sum()
    timeit("C geom+pack+kernel", jax.jit(c_fn), vcam, faces_idx)

    def d_fn(vcam, faces_idx):
        maps = render_targets(vcam, faces_idx,
                              ("silhouette", "normal", "depth"),
                              image_size=IMG)
        return sum(m.sum() for m in maps.values())
    timeit("D full render_targets", jax.jit(d_fn), vcam, faces_idx)


if __name__ == "__main__":
    main()
