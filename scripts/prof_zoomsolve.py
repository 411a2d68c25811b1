"""Variants of the zoom_tos solve — the full perspective_transform
measured 67.5 ms vs 7.6 ms with a fixed zoom, for what is one [B, V]
ratio + a min reduction.  Hypotheses: (a) the [B, V, 3] minor-dim-3
slices get re-materialized for the reduction (lane-crossing relayout),
(b) the reduce breaks the elementwise fusion so x/y/z are written to HBM
twice.  Variants compute the same result."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from sdn3d_tpu.geometry.assets import load_shapenet_bank
from sdn3d_tpu.geometry.transforms import (quaternion_to_matrix,
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
    print(f"{name:30s}: {dt:9.1f} ms")
    return dt


def main():
    bank = load_shapenet_bank("/root/reference/geometric/assets")
    nv = int(bank.num_vertices[0])
    rng = np.random.RandomState(0)
    verts = jnp.asarray(np.repeat(bank.vertices[0, :nv][None], B, 0))
    thetas = jnp.asarray(rng.uniform(-np.pi, np.pi, B).astype(np.float32))
    trans = jnp.asarray(np.stack(
        [rng.uniform(-1, 1, B), rng.uniform(-0.5, 0.5, B),
         -rng.uniform(5, 12, B)], 1).astype(np.float32))
    zoom_tos = jnp.full((B, 1), 0.5)

    def prefix(thetas, verts):
        q = y_rotation_quaternion(thetas)
        T = quaternion_to_matrix(q)
        v = jnp.einsum("bvj,bkj->bvk", verts, T,
                       precision=jax.lax.Precision.HIGHEST)
        v = v + trans[:, None, :]
        return v

    def cur(thetas, verts):
        v = prefix(thetas, verts)
        pt = trans[:, None, :]
        x, y, z = v[..., 0], v[..., 1], v[..., 2]
        x0, y0, z0 = pt[..., 0], pt[..., 1], pt[..., 2]
        x = x - x0 / z0 * z
        y = y - y0 / z0 * z
        ratio = jnp.abs(z) / jnp.maximum(jnp.abs(x), jnp.abs(y))
        zooms = jnp.min(ratio, axis=1, keepdims=True) * zoom_tos
        z = z / zooms
        out = jnp.stack([x, y, z], axis=2)
        return out.sum() + zooms.sum()
    timeit("current (slice minor-3)", jax.jit(cur), thetas, verts)

    def planar(thetas, verts):
        v = prefix(thetas, verts).transpose(0, 2, 1)        # [B, 3, V]
        pt = trans[:, :, None]
        x, y, z = v[:, 0], v[:, 1], v[:, 2]
        x0, y0, z0 = pt[:, 0], pt[:, 1], pt[:, 2]
        x = x - x0 / z0 * z
        y = y - y0 / z0 * z
        ratio = jnp.abs(z) / jnp.maximum(jnp.abs(x), jnp.abs(y))
        zooms = jnp.min(ratio, axis=1, keepdims=True) * zoom_tos
        z = z / zooms
        out = jnp.stack([x, y, z], axis=1)                  # [B, 3, V]
        return out.sum() + zooms.sum()
    timeit("planar transpose", jax.jit(planar), thetas, verts)

    def maxratio(thetas, verts):
        # reassociated: min(|z|/m) == 1/max(m/|z|); one reduce, same math
        v = prefix(thetas, verts)
        pt = trans[:, None, :]
        x, y, z = v[..., 0], v[..., 1], v[..., 2]
        x0, y0, z0 = pt[..., 0], pt[..., 1], pt[..., 2]
        x = x - x0 / z0 * z
        y = y - y0 / z0 * z
        m = jnp.maximum(jnp.abs(x), jnp.abs(y)) / jnp.abs(z)
        zooms = zoom_tos / jnp.max(m, axis=1, keepdims=True)
        z = z / zooms
        out = jnp.stack([x, y, z], axis=2)
        return out.sum() + zooms.sum()
    timeit("reassoc max", jax.jit(maxratio), thetas, verts)

    def twopass(thetas, verts):
        # recompute x/y in a second fused pass instead of carrying them
        # across the reduction
        v = prefix(thetas, verts)
        pt = trans[:, None, :]
        sx = pt[..., 0] / pt[..., 2]
        sy = pt[..., 1] / pt[..., 2]
        x, y, z = v[..., 0], v[..., 1], v[..., 2]
        m = jnp.maximum(jnp.abs(x - sx * z), jnp.abs(y - sy * z)) / jnp.abs(z)
        zooms = zoom_tos / jnp.max(m, axis=1, keepdims=True)
        out = jnp.stack([x - sx * z, y - sy * z, z / zooms], axis=2)
        return out.sum() + zooms.sum()
    timeit("two-pass recompute", jax.jit(twopass), thetas, verts)


if __name__ == "__main__":
    main()
