"""Compare rasterizer kernel v1 vs v3 on the real TPU."""
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

SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 768
B = 16


def fence(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0])


def timeit(name, fn, *args, iters=3, vary=None):
    out = fn(*args)
    fence(out)
    t0 = time.perf_counter()
    for i in range(iters):
        a = list(args)
        if vary is not None:
            a[vary] = a[vary] + 1e-4 * (i + 1)
        out = fn(*a)
    fence(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:34s}: {dt*1e3:9.1f} ms")
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

    def fv_fn(verts, thetas, trans):
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

    fv = jax.block_until_ready(jax.jit(fv_fn)(verts, thetas, trans))

    outs = {}
    for ver in (1, 3):
        packed, aux, cb, perm = jax.jit(
            lambda fv, v=ver: RP.pack_faces(fv, None, SIZE, version=v))(fv)
        packed = jax.block_until_ready(packed)
        out = timeit(f"kernel v{ver}",
                     lambda p, a=aux, c=cb, v=ver:
                     RP.rasterize_face_index_pallas(p, a, c, SIZE, version=v),
                     packed, vary=None)
        outs[ver] = (np.asarray(out[0]), np.asarray(out[1]), np.asarray(perm))

        def full(fv, v=ver):
            pk, ax, cbx, pm = RP.pack_faces(fv, None, SIZE, version=v)
            fi, d = RP.rasterize_face_index_pallas(pk, ax, cbx, SIZE,
                                                   version=v)
            return (fi >= 0).astype(jnp.float32), d
        timeit(f"full fwd v{ver} (pack+kernel)", jax.jit(full), fv, vary=0)

    fi1, d1, p1 = outs[1]
    fi3, d3, p3 = outs[3]
    # unpermute to original ids for comparison
    def unperm(fi, perm):
        hit = fi >= 0
        out = np.where(hit, np.take_along_axis(
            perm, np.where(hit, fi, 0).reshape(B, -1), 1).reshape(fi.shape),
            -1)
        return out
    u1, u3 = unperm(fi1, p1), unperm(fi3, p3)
    print("face-index maps equal:", np.array_equal(u1, u3),
          " mismatched px:", int((u1 != u3).sum()))
    hit = (u1 >= 0) & (u3 >= 0)
    print("depth allclose:",
          np.allclose(d1[hit], d3[hit], rtol=2e-4, atol=1e-5))


if __name__ == "__main__":
    main()
