"""Split profile of the fused-normal render path at 256^2 AA x16.

Questions: (a) pack_faces vs kernel split; (b) cost of the with_color
third RMW plane in the kernel; (c) cost of the [B,H,W,3] minor-axis
color unpack + moveaxis vs a planar [B,3,H,W] unpack."""
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
from sdn3d_tpu.render.renderer import _fill_back

B = 16
IMG = int(sys.argv[1]) if len(sys.argv) > 1 else 256
SIZE = IMG * 2


def fence(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0])


def timeit(name, fn, *args, iters=6, vary=0):
    out = fn(*args)
    fence(out)
    t0 = time.perf_counter()
    for i in range(iters):
        a = list(args)
        a[vary] = a[vary] + (1e-5 * (i + 1) if a[vary].dtype != jnp.int32
                             else 0)
        out = fn(*a)
    fence(out)
    print(f"{name:34s}: {(time.perf_counter()-t0)/iters*1e3:9.1f} ms")
    return out


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

    q = y_rotation_quaternion(thetas)
    vcam, _ = jax.jit(lambda v, q, t: perspective_transform(
        v, scales=jnp.ones((B, 3)), rotations=q, translations=t,
        perspective_translations=t, zoom_tos=jnp.full((B, 1), 0.5)))(
            verts, q, trans)

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

    fv, colors = jax.jit(geom)(vcam, faces_idx)
    fv = jax.block_until_ready(fv)
    valid = jnp.ones(fv.shape[:2], bool)

    timeit("geom (camera+normals+fv)",
           jax.jit(lambda vc, fi: geom(vc, fi)), vcam, faces_idx)

    pack_nc = jax.jit(lambda fv: RP.pack_faces(fv, None, SIZE, version=3))
    timeit("pack_faces (no color)", pack_nc, fv)

    pack_c = jax.jit(lambda fv, c: RP.pack_faces(fv, None, SIZE, version=3,
                                                 colors=c))
    packed, aux, cb, perm = timeit("pack_faces (color)", pack_c, fv, colors)

    packed = jax.block_until_ready(packed)

    def kern_nc(packed, aux, cb):
        fi, d = RP.rasterize_face_index_pallas(packed, aux, cb, SIZE,
                                               version=3)
        return fi.sum(), d.sum()
    timeit("kernel (no color)", kern_nc, packed, aux, cb)

    def kern_c(packed, aux, cb):
        fi, d, rgb = RP.rasterize_face_index_pallas(
            packed, aux, cb, SIZE, version=3, with_color=True)
        return fi.sum(), d.sum(), rgb.sum()
    timeit("kernel (color+unpack hwc)", kern_c, packed, aux, cb)

    def kern_c_raw(packed, aux, cb):
        # raw packed q plane, no unpack (measures the kernel RMW only)
        outs = RP.rasterize_face_index_pallas.__wrapped__(
            packed, aux, cb, SIZE, 0.1, 100.0, version=3, with_color=True) \
            if hasattr(RP.rasterize_face_index_pallas, "__wrapped__") else None
        return outs
    # fall back: time unpack alone on a fixed q plane
    fi, d, rgb = RP.rasterize_face_index_pallas(packed, aux, cb, SIZE,
                                                version=3, with_color=True)
    qplane = jnp.asarray(
        np.random.RandomState(0).randint(0, 1 << 30,
                                         (B, SIZE, SIZE), np.int32))
    fi = jax.block_until_ready(fi)

    def unpack_hwc(q, fi):
        hit = (fi >= 0)[..., None]
        rgb = jnp.stack([q & 0x3FF, (q >> 10) & 0x3FF, (q >> 20) & 0x3FF],
                        axis=-1).astype(jnp.float32) / 511.5 - 1.0
        return jnp.where(hit, rgb, 0.0).sum()
    timeit("unpack hwc (stack axis -1)", jax.jit(unpack_hwc), qplane, fi,
           vary=1)

    def unpack_chw(q, fi):
        hit = (fi >= 0)[:, None]
        rgb = jnp.stack([q & 0x3FF, (q >> 10) & 0x3FF, (q >> 20) & 0x3FF],
                        axis=1).astype(jnp.float32) / 511.5 - 1.0
        return jnp.where(hit, rgb, 0.0).sum()
    timeit("unpack chw (stack axis 1)", jax.jit(unpack_chw), qplane, fi,
           vary=1)

    def finish_chw(q, fi):
        hit = (fi >= 0)[:, None]
        rgb = jnp.stack([q & 0x3FF, (q >> 10) & 0x3FF, (q >> 20) & 0x3FF],
                        axis=1).astype(jnp.float32) / 511.5 - 1.0
        rgb = jnp.where(hit, rgb, 0.0)
        rgb = jnp.flip(rgb, axis=2)
        s = rgb.shape
        rgb = rgb.reshape(s[:-2] + (s[-2] // 2, 2, s[-1] // 2, 2))
        rgb = rgb.mean(axis=(-3, -1))
        return rgb.sum()
    timeit("unpack+flip+AA chw", jax.jit(finish_chw), qplane, fi, vary=1)


if __name__ == "__main__":
    main()
