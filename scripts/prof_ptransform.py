"""Isolate perspective_transform (incl. zoom_tos solve) at bench shapes.

bench.py measured 252 ms/step while the full fused render_targets is
~111 ms — the delta has to be the vertex transform.  Suspects: the
zoom_tos solve (global min/max reductions over V), the HIGHEST-precision
einsum, or a layout stall on the [B, V, 3] minor-dim-3 arrays."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from sdn3d_tpu.geometry.assets import load_shapenet_bank
from sdn3d_tpu.geometry.transforms import (perspective_transform,
                                           y_rotation_quaternion)

B = 16


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
    print(f"{name:28s}: {dt:9.1f} ms")
    return dt


def main():
    bank = load_shapenet_bank("/root/reference/geometric/assets")
    nv = int(bank.num_vertices[0])
    rng = np.random.RandomState(0)
    verts = jnp.asarray(np.repeat(bank.vertices[0, :nv][None], B, 0))
    print("verts:", verts.shape)
    thetas = jnp.asarray(rng.uniform(-np.pi, np.pi, B).astype(np.float32))
    trans = jnp.asarray(np.stack(
        [rng.uniform(-1, 1, B), rng.uniform(-0.5, 0.5, B),
         -rng.uniform(5, 12, B)], 1).astype(np.float32))

    def full(thetas, verts):
        q = y_rotation_quaternion(thetas)
        vcam, z = perspective_transform(
            verts, scales=jnp.ones((B, 3)), rotations=q, translations=trans,
            perspective_translations=trans, zoom_tos=jnp.full((B, 1), 0.5))
        return vcam.sum() + z.sum()
    timeit("full ptransform+zoomsolve", jax.jit(full), thetas, verts)

    def nozoom(thetas, verts):
        q = y_rotation_quaternion(thetas)
        vcam = perspective_transform(
            verts, scales=jnp.ones((B, 3)), rotations=q, translations=trans,
            perspective_translations=trans, zooms=jnp.full((B, 1), 4.0))
        return vcam.sum()
    timeit("ptransform fixed zoom", jax.jit(nozoom), thetas, verts)

    def rotonly(thetas, verts):
        q = y_rotation_quaternion(thetas)
        from sdn3d_tpu.geometry.transforms import quaternion_to_matrix
        T = quaternion_to_matrix(q)
        v = jnp.einsum("bvj,bkj->bvk", verts, T,
                       precision=jax.lax.Precision.HIGHEST)
        return v.sum()
    timeit("rotate only (einsum)", jax.jit(rotonly), thetas, verts)

    def rotdef(thetas, verts):
        q = y_rotation_quaternion(thetas)
        from sdn3d_tpu.geometry.transforms import quaternion_to_matrix
        T = quaternion_to_matrix(q)
        v = jnp.einsum("bvj,bkj->bvk", verts, T)
        return v.sum()
    timeit("rotate only (default prec)", jax.jit(rotdef), thetas, verts)


if __name__ == "__main__":
    main()
