"""In-process sweep of v3 kernel configs with more iterations."""
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
ITERS = 8


def fence(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0])


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

    configs = []
    for name, ver, th, gr, ch in [
        ("v1 base", 1, 64, 32, 1024),
        ("v3 th=768 g=32 c=1024", 3, 768, 32, 1024),
        ("v3 th=768 g=32 c=2048", 3, 768, 32, 2048),
        ("v3 th=768 g=64 c=2048", 3, 768, 64, 2048),
        ("v3 th=768 g=64 c=4096", 3, 768, 64, 4096),
        ("v3 th=256 g=32 c=2048", 3, 256, 32, 2048),
    ]:
        configs.append((name, ver, th, gr, ch))

    fns = {}
    for name, ver, th, gr, ch in configs:
        RP.TILE_H3, RP.GROUP, RP.FACE_CHUNK = th, gr, ch
        RP.rasterize_face_index_pallas.clear_cache()

        def full(fv, v=ver):
            pk, ax, cbx, pm = RP.pack_faces(fv, None, SIZE, version=v)
            fi, d = RP.rasterize_face_index_pallas(pk, ax, cbx, SIZE,
                                                   version=v)
            return (fi >= 0).astype(jnp.float32), d
        f = jax.jit(full)
        fence(f(fv))  # compile under this config
        fns[name] = f

        t0 = time.perf_counter()
        for i in range(ITERS):
            out = f(fv + 1e-4 * (i + 1))
        fence(out)
        dt = (time.perf_counter() - t0) / ITERS
        print(f"{name:26s}: {dt*1e3:9.1f} ms")


if __name__ == "__main__":
    main()
