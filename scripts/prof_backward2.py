"""Bisect the gradV vs gradA gap."""
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

SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 512
WALK = int(sys.argv[2]) if len(sys.argv) > 2 else 64
B = 16


def fence(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0])


def timeit(name, fn, *args, iters=3, vary=0):
    out = fn(*args)
    fence(out)
    t0 = time.perf_counter()
    for i in range(iters):
        a = list(args)
        a[vary] = a[vary] + 1e-4 * (i + 1)
        out = fn(*a)
    fence(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:28s}: {dt*1e3:9.1f} ms")
    return dt


def main():
    bank = load_shapenet_bank("/root/reference/geometric/assets")
    nv, nf = int(bank.num_vertices[0]), int(bank.num_faces[0])
    verts_np = bank.vertices[0, :nv]
    faces_np = bank.faces[0, :nf]
    rng = np.random.RandomState(0)

    verts = jnp.asarray(np.repeat(verts_np[None], B, 0))
    faces_idx = jnp.asarray(np.repeat(faces_np[None], B, 0))
    thetas = jnp.asarray(rng.uniform(-np.pi, np.pi, B).astype(np.float32))
    trans = jnp.asarray(np.stack(
        [rng.uniform(-1, 1, B), rng.uniform(-0.5, 0.5, B),
         -rng.uniform(5, 12, B)], 1).astype(np.float32))

    def project(verts, thetas, trans):
        q = y_rotation_quaternion(thetas)
        vcam, _ = perspective_transform(
            verts, scales=jnp.ones((B, 3)), rotations=q, translations=trans,
            perspective_translations=trans, zoom_tos=jnp.full((B, 1), 0.5))
        vcam = vcam * jnp.asarray([-1.0, 1.0, 1.0])
        eye = jnp.zeros((B, 3))
        d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), (B, 3))
        up = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (B, 3))
        v = camera.look(vcam, eye, d, up)
        return camera.perspective_divide(v, 30.0)

    vproj = jax.jit(project)(verts, thetas, trans)
    vproj = jax.block_until_ready(vproj)
    f2np = np.concatenate([np.asarray(faces_idx),
                           np.asarray(faces_idx)[:, :, ::-1]], axis=1)
    f2 = jnp.asarray(f2np)

    def sil(fv):
        return R.rasterize_silhouettes(
            fv, None, SIZE, anti_aliasing=False, grad_walk=WALK).sum()

    # gradV with f2 as a jit ARGUMENT
    def loss_v(vproj, f2):
        return sil(camera.vertices_to_faces(vproj, f2))
    timeit("gradV f2-as-arg", jax.jit(jax.grad(loss_v)), vproj, f2)

    # gradV + in-jit fill_back from single-sided faces
    def loss_vf(vproj, faces_idx):
        ff, _ = _fill_back(faces_idx, None)
        return sil(camera.vertices_to_faces(vproj, ff))
    timeit("gradV in-jit fill_back", jax.jit(jax.grad(loss_vf)),
           vproj, faces_idx)

    # + transforms, grad wrt verts only
    def loss_a0(verts, thetas, trans, faces_idx):
        v = project(verts, thetas, trans)
        ff, _ = _fill_back(faces_idx, None)
        return sil(camera.vertices_to_faces(v, ff))
    timeit("gradA wrt verts only", jax.jit(jax.grad(loss_a0)),
           verts, thetas, trans, faces_idx)
    timeit("gradA wrt v,th,tr",
           jax.jit(jax.grad(loss_a0, argnums=(0, 1, 2))),
           verts, thetas, trans, faces_idx, vary=1)

    # gradF variants: reduce output inside jit to kill layout cost
    fv = jax.jit(camera.vertices_to_faces)(vproj, f2)
    fv = jax.block_until_ready(fv)
    timeit("gradF raw output", jax.jit(jax.grad(sil)), fv)

    def gradF_reduced(fv):
        g = jax.grad(sil)(fv)
        return (g * fv).sum()
    timeit("gradF reduced in-jit", jax.jit(gradF_reduced), fv)


if __name__ == "__main__":
    main()


def adj_variant():
    """Compare v2f scatter VJP vs adjacency gather VJP at SIZE^2 x 16."""
    from sdn3d_tpu.geometry.assets import _vertex_adjacency
    bank = load_shapenet_bank("/root/reference/geometric/assets")
    nv, nf = int(bank.num_vertices[0]), int(bank.num_faces[0])
    rng = np.random.RandomState(0)
    verts = jnp.asarray(np.repeat(bank.vertices[0, :nv][None], B, 0))
    faces_idx = jnp.asarray(np.repeat(bank.faces[0, :nf][None], B, 0))
    adj = jnp.asarray(np.repeat(
        bank.adjacency[0, :nv][None], B, 0))
    thetas = jnp.asarray(rng.uniform(-np.pi, np.pi, B).astype(np.float32))
    trans = jnp.asarray(np.stack(
        [rng.uniform(-1, 1, B), rng.uniform(-0.5, 0.5, B),
         -rng.uniform(5, 12, B)], 1).astype(np.float32))

    def project(verts, thetas, trans):
        q = y_rotation_quaternion(thetas)
        vcam, _ = perspective_transform(
            verts, scales=jnp.ones((B, 3)), rotations=q, translations=trans,
            perspective_translations=trans, zoom_tos=jnp.full((B, 1), 0.5))
        vcam = vcam * jnp.asarray([-1.0, 1.0, 1.0])
        eye = jnp.zeros((B, 3))
        d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), (B, 3))
        up = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (B, 3))
        v = camera.look(vcam, eye, d, up)
        return camera.perspective_divide(v, 30.0)

    def sil(fv):
        return R.rasterize_silhouettes(
            fv, None, SIZE, anti_aliasing=False, grad_walk=WALK).sum()

    def loss_scatter(verts, thetas, trans):
        v = project(verts, thetas, trans)
        ff, _ = _fill_back(faces_idx, None)
        return sil(camera.vertices_to_faces(v, ff))

    def loss_adj(verts, thetas, trans):
        v = project(verts, thetas, trans)
        ff, _ = _fill_back(faces_idx, None)
        return sil(camera.vertices_to_faces_adj(v, ff, adj, fill_back=True))

    ga = jax.jit(jax.grad(loss_scatter, argnums=(0, 1, 2)))
    gb = jax.jit(jax.grad(loss_adj, argnums=(0, 1, 2)))
    timeit("gradA scatter v2f", ga, verts, thetas, trans, vary=1)
    timeit("gradA adjacency v2f", gb, verts, thetas, trans, vary=1)
    a = ga(verts, thetas, trans)
    b = gb(verts, thetas, trans)
    print("grad verts allclose:",
          np.allclose(np.asarray(a[0]), np.asarray(b[0]), rtol=1e-4,
                      atol=1e-5))


if __name__ == "__main__" and len(sys.argv) > 3 and sys.argv[3] == "adj":
    adj_variant()
