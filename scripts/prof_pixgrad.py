"""Split _silhouette_grad_pixelwise cost: walk loop vs pix->face scatter."""
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

SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 768
B = 16


def fence(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0])


def timeit(name, fn, *args, iters=4, vary=0):
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
    fi, _, _, _ = jax.jit(lambda fv: R.rasterize_face_maps(
        fv, None, SIZE, return_face_inv=False, return_weights=False))(fv)
    fi = jax.block_until_ready(fi)
    alpha = (fi >= 0).astype(jnp.float32)
    ga = jnp.ones_like(alpha) * 0.5
    valid = jnp.ones(fv.shape[:2], bool)

    import sdn3d_tpu.ops.rasterize as RR

    for walk in (16, 64):
        def pixgrad(fv, walk=walk):
            g = RR._silhouette_grad_pixelwise(fv, valid, fi, alpha, ga,
                                              SIZE, 1e-4, walk=walk)
            return (g * g).sum()   # reduce to avoid output layout cost
        timeit(f"pixgrad walk={walk}", jax.jit(pixgrad), fv)

    # scatter-only variant: monkeypatch-free measurement of the segment
    # sums by reproducing the tail on random acc
    F = fv.shape[1]
    acc = jnp.asarray(rng.randn(B, SIZE, SIZE, 3, 2).astype(np.float32))
    hit = fi >= 0
    fi_c = jnp.where(hit, fi, 0)

    def scatter_tail(acc):
        seg = (fi_c + jnp.arange(B)[:, None, None] * F).reshape(-1)
        a = jnp.where(hit[..., None, None], -acc, 0.0)
        comps = [jax.ops.segment_sum(a[..., v, c].reshape(-1), seg,
                                     num_segments=B * F)
                 for v in range(3) for c in range(2)]
        g = jnp.stack(comps, axis=-1)
        return (g * g).sum()
    timeit("scatter tail only", jax.jit(scatter_tail), acc)

    # walk-only: replace the scatter with a plain sum
    def walk_only(fv):
        # inline call but consume acc via global sum (no scatter)
        g = RR._silhouette_grad_pixelwise(fv, valid, fi, alpha, ga,
                                          SIZE, 1e-4, walk=64)
        return g
    # can't easily split without editing; estimate = pixgrad - scatter


if __name__ == "__main__":
    main()
