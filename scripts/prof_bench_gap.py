"""Decompose the gap between bench.py (190 ms/iter) and the scalarized
render_targets stage time (~111 ms at 512^2): transform cost, map
materialization cost, dispatch overhead.

 A scalarized      : transforms + render_targets, on-device scalar out
 B full-maps       : same, maps as jit outputs (bench.py's shape)
 C no-transform    : precomputed vcam, maps as outputs
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from sdn3d_tpu.geometry.assets import load_shapenet_bank
from sdn3d_tpu.geometry.transforms import (perspective_transform,
                                           y_rotation_quaternion)
from sdn3d_tpu.render import render_targets

B = 16
IMG = 256


def fence(x):
    np.asarray(jax.tree_util.tree_leaves(x)[-1])


def timeit(name, fn, *args, iters=6, vary=0):
    out = fn(*args)
    fence(out)
    t0 = time.perf_counter()
    for i in range(iters):
        a = list(args)
        a[vary] = a[vary] + 1e-5 * (i + 1)
        out = fn(*a)
    fence(out)
    print(f"{name:16s}: {(time.perf_counter()-t0)/iters*1e3:8.1f} ms")


def main():
    bank = load_shapenet_bank("/root/reference/geometric/assets")
    nv, nf = int(bank.num_vertices[0]), int(bank.num_faces[0])
    rng = np.random.RandomState(0)
    verts = jnp.asarray(np.repeat(bank.vertices[0, :nv][None], B, 0))
    faces = jnp.asarray(np.repeat(bank.faces[0, :nf][None], B, 0))
    thetas = jnp.asarray(rng.uniform(-np.pi, np.pi, B).astype(np.float32))
    trans = jnp.asarray(np.stack(
        [rng.uniform(-1, 1, B), rng.uniform(-0.5, 0.5, B),
         -rng.uniform(5, 12, B)], 1).astype(np.float32))

    def transform(verts, thetas):
        q = y_rotation_quaternion(thetas)
        vcam, _ = perspective_transform(
            verts, scales=jnp.ones((B, 3)), rotations=q, translations=trans,
            perspective_translations=trans, zoom_tos=jnp.full((B, 1), 0.5))
        return vcam

    @jax.jit
    def a_fn(verts, faces, thetas):
        maps = render_targets(transform(verts, thetas), faces,
                              ("silhouette", "normal", "depth"),
                              image_size=IMG)
        return sum(m.sum() for m in maps.values())

    @jax.jit
    def b_fn(verts, faces, thetas):
        maps = render_targets(transform(verts, thetas), faces,
                              ("silhouette", "normal", "depth"),
                              image_size=IMG)
        return (maps["silhouette"], maps["normal"], maps["depth"],
                maps["depth"].sum())

    vcam = jax.block_until_ready(jax.jit(transform)(verts, thetas))

    @jax.jit
    def c_fn(vcam, faces):
        maps = render_targets(vcam, faces,
                              ("silhouette", "normal", "depth"),
                              image_size=IMG)
        return (maps["silhouette"], maps["normal"], maps["depth"],
                maps["depth"].sum())

    # Interleave round-robin: sequential per-variant loops are exposed to
    # the relay's slow drift (+-30% between blocks); interleaving cancels
    # it (see verify SKILL.md measurement notes).
    variants = [
        ("A scalarized", a_fn, lambda i: (verts, faces, thetas + 1e-5 * i)),
        ("B full-maps", b_fn, lambda i: (verts, faces, thetas + 1e-5 * i)),
        ("C no-transform", c_fn, lambda i: (vcam + 1e-6 * i, faces)),
    ]
    for _, fn, argf in variants:
        fence(fn(*argf(0)))
    iters = 8
    tot = {n: 0.0 for n, _, _ in variants}
    for i in range(1, iters + 1):
        for n, fn, argf in variants:
            t0 = time.perf_counter()
            fence(fn(*argf(i)))
            tot[n] += time.perf_counter() - t0
    for n, dt in tot.items():
        print(f"{n:16s}: {dt/iters*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
