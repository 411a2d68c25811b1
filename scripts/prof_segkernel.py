"""Standalone timing: segment_face_grads_pallas vs XLA segment_sum."""
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


def timeit(name, fn, *args, iters=6, vary=0):
    out = fn(*args)
    fence(out)
    t0 = time.perf_counter()
    for i in range(iters):
        a = list(args)
        a[vary] = a[vary] + 1e-6 * (i + 1)
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

    def fv_fn(verts):
        q = y_rotation_quaternion(thetas)
        vcam, _ = perspective_transform(
            verts, scales=jnp.ones((B, 3)), rotations=q, translations=trans,
            perspective_translations=trans, zoom_tos=jnp.full((B, 1), 0.5))
        vcam = vcam * jnp.asarray([-1.0, 1.0, 1.0])
        eye = jnp.zeros((B, 3))
        d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), (B, 3))
        up = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (B, 3))
        v = camera.look(vcam, eye, d, up)
        v = camera.perspective_divide(v, 30.0)
        ff, _ = _fill_back(faces_idx, None)
        return camera.vertices_to_faces(v, ff)

    fv0 = jax.block_until_ready(jax.jit(fv_fn)(verts))
    F = fv0.shape[1]
    valid0 = jnp.ones((B, F), bool)

    # sorted face space (what the silhouette VJP now uses)
    def sort_fn(fv0):
        fi, perm = R._rasterize_sorted(fv0, valid0, SIZE, 0.1, 100.0)
        pf = perm[:, :F]
        fv_s = jax.vmap(lambda fb, pb: fb[pb])(fv0, pf)
        return fi, fv_s
    fi, fv = jax.jit(sort_fn)(fv0)
    fi = jax.block_until_ready(fi)
    acc8 = jnp.asarray(rng.randn(B, 8, SIZE, SIZE).astype(np.float32))
    hit = fi >= 0
    fi_c = jnp.where(hit, fi, 0)

    from sdn3d_tpu.ops.rasterize import _face_inv, _frontface
    ok = jax.jit(lambda fv: _frontface(fv) & _face_inv(fv, SIZE)[1])(fv)

    def pallas_path(acc8, fv):
        aux, cb = RP.pack_seg_aux(fv, SIZE, ok)
        out = RP.segment_face_grads_pallas(acc8, fi, aux, cb, SIZE)
        return (out[:, :F, :6] ** 2).sum()
    timeit("pallas seg (pack+kernel)", jax.jit(pallas_path), acc8, fv)

    def pallas_kernel_only(acc8, aux, cb):
        out = RP.segment_face_grads_pallas(acc8, fi, aux, cb, SIZE)
        return (out[:, :F, :6] ** 2).sum()
    aux, cb = jax.jit(lambda fv: RP.pack_seg_aux(fv, SIZE, ok))(fv)
    aux = jax.block_until_ready(aux)
    timeit("pallas seg kernel only", jax.jit(pallas_kernel_only),
           acc8, aux, cb)

    def xla_path(acc8):
        seg = (fi_c + jnp.arange(B)[:, None, None] * F).reshape(-1)
        sums = [jax.ops.segment_sum(
            jnp.where(hit, acc8[:, p], 0.0).reshape(-1), seg,
            num_segments=B * F) for p in range(6)]
        g = jnp.stack(sums, axis=-1)
        return (g ** 2).sum()
    timeit("xla segment_sum x6", jax.jit(xla_path), acc8)

    # numeric parity on hardware
    out = jax.jit(lambda a: RP.segment_face_grads_pallas(
        a, fi, aux, cb, SIZE))(acc8)
    seg = (fi_c + jnp.arange(B)[:, None, None] * F).reshape(-1)
    ref = jnp.stack([jax.ops.segment_sum(
        jnp.where(hit, acc8[:, p], 0.0).reshape(-1), seg,
        num_segments=B * F) for p in range(6)], -1).reshape(B, F, 6)
    print("parity:", np.allclose(np.asarray(out)[:, :F, :6],
                                 np.asarray(ref), rtol=1e-3, atol=1e-3),
          float(np.abs(np.asarray(out)[:, :F, :6] - np.asarray(ref)).max()))


if __name__ == "__main__":
    main()
