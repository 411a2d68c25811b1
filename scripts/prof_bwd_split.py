"""Cumulative split of _silhouette_grad_pixelwise at SIZE^2 x 16
(production derenderer shapes), scalarized outputs.

 A pp gather       : per-pixel own-face vertex coords, both axes
 B A+invariants    : + 18 invariant planes per axis
 C B+walk kernel   : + Pallas halo walk (accs)
 D full            : + MXU pixel->face reduction (the real entry point)
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
from sdn3d_tpu.ops import rasterize as RR
from sdn3d_tpu.ops import rasterize_pallas as RP
from sdn3d_tpu.render.renderer import _fill_back

SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 768
WALK = int(sys.argv[2]) if len(sys.argv) > 2 else 64
B = 16
_f32 = jnp.float32


def fence(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0])


def timeit(name, fn, *args, iters=4):
    out = fn(*args)
    fence(out)
    t0 = time.perf_counter()
    for i in range(iters):
        a = list(args)
        a[0] = a[0] + 1e-5 * (i + 1)
        out = fn(*a)
    fence(out)
    print(f"{name:24s}: {(time.perf_counter()-t0)/iters*1e3:9.1f} ms")


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

    fv = jax.block_until_ready(jax.jit(fv_fn)(verts))
    valid = jnp.ones(fv.shape[:2], bool)
    fi, _, perm = jax.jit(lambda fv: RR._rasterize_sorted(
        fv, valid, SIZE, 0.1, 100.0))(fv)
    fi = jax.block_until_ready(fi)
    # sorted face space (what the production bwd sees)
    fvs = jax.jit(lambda fv: jax.vmap(lambda fb, pb: fb[pb])(
        fv, perm[:, :fv.shape[1]]))(fv)
    fvs = jax.block_until_ready(fvs)
    alpha = (fi >= 0).astype(_f32)
    ga = jnp.ones_like(alpha) * 0.5

    isz = SIZE

    def stages(fvs, upto):
        hit = fi >= 0
        fi_c = jnp.where(hit, fi, 0)
        pp_all = 0.5 * (fvs[..., :2] * isz + isz - 1)
        acc = jnp.zeros((), _f32)
        comps = {(v, c): jnp.zeros((B, isz, isz), _f32)
                 for v in range(3) for c in range(2)}
        for axis in range(2):
            if axis == 0:
                hit_l, fi_l, alpha_l, grad_l = hit, fi_c, alpha, ga
            else:
                hit_l = hit.transpose(0, 2, 1)
                fi_l = fi_c.transpose(0, 2, 1)
                alpha_l = alpha.transpose(0, 2, 1)
                grad_l = ga.transpose(0, 2, 1)
            pp_l = jax.vmap(lambda pb, fb: pb[fb])(pp_all, fi_l)
            if upto == "gather":
                acc = acc + pp_l.sum()
                continue
            u_all = pp_l[..., axis]
            v_all = pp_l[..., 1 - axis]
            d1 = jax.lax.broadcasted_iota(_f32, (isz, isz), 0)[None]
            d0 = jax.lax.broadcasted_iota(_f32, (isz, isz), 1)[None]
            planes = []
            for e in range(3):
                E = RR._edge_invariants(u_all, v_all, d0, d1, hit_l, isz,
                                        axis, e)
                planes += [E["d1_cross"], E["direction"], E["kA"], E["kB"],
                           E["j_gate"], E["is_in_pixel"].astype(_f32)]
            inv_stack = jnp.stack(planes, axis=1)
            if upto == "invariants":
                acc = acc + inv_stack.sum()
                continue
            accs = RP.walk_grads_pallas(alpha_l, grad_l, inv_stack, WALK,
                                        1e-4)
            if upto == "walk":
                acc = acc + accs.sum()
                continue
            for v in range(3):
                a = accs[:, v]
                if axis == 1:
                    a = a.transpose(0, 2, 1)
                comps[(v, 1 - axis)] = comps[(v, 1 - axis)] + a
        if upto in ("gather", "invariants", "walk"):
            return acc
        g = RR._reduce_pixel_grads(fvs, valid, fi, hit, fi_c, comps,
                                   jnp.zeros((B, isz, isz), _f32), isz,
                                   B, fvs.shape[1])
        return (g * g).sum()

    timeit("A pp gather x2", jax.jit(lambda f: stages(f, "gather")), fvs)
    timeit("B A+invariants", jax.jit(lambda f: stages(f, "invariants")), fvs)
    timeit("C B+walk kernel", jax.jit(lambda f: stages(f, "walk")), fvs)
    timeit("D full (reduction)", jax.jit(lambda f: stages(f, "full")), fvs)

    def prod(fvs):
        g = RR._silhouette_grad_pixelwise(fvs, valid, fi, alpha, ga,
                                          SIZE, 1e-4, walk=WALK)
        return (g * g).sum()
    timeit("E production entry", jax.jit(prod), fvs)


if __name__ == "__main__":
    main()
