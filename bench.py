"""Benchmark: batched differentiable multi-object rendering throughput.

Measures the hot path that bounds the reference's 92-pair edit benchmark —
per-object silhouette/normal/depth rendering (the reference does this in a
per-object Python loop through a torch->CPU->chainer bridge,
derender3d/models/__init__.py:161-224 + renderer.py:130-150).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline context: the reference renders one object at a time; measured
PyTorch/CUDA NMR implementations run ~15-40 renders/s at 256^2 with AA on a
V100-class GPU for ShapeNet-sized meshes, and 3D-SDN adds two host round
trips per render.  `vs_baseline` is computed against a 30 objects/s
single-object-loop reference estimate (BASELINE.md: repo publishes no
numbers; parity must be self-measured).
"""

import json
import time

import numpy as np

REFERENCE_OBJECTS_PER_SEC = 30.0


def main():
    import jax
    import jax.numpy as jnp

    from sdn3d_tpu.data.synthetic import make_sphere_mesh
    from sdn3d_tpu.geometry.transforms import (
        perspective_transform, y_rotation_quaternion)
    from sdn3d_tpu.render import RenderType, render

    # Workload: 16 objects (the reference's per-image cap,
    # geometric/scripts/main.py:812) x sphere mesh, 256^2 renders with AA
    # (rasterized at 512^2), silhouette + normal + depth like mode=extend.
    B = 16
    image_size = 256
    verts_np, faces_np = make_sphere_mesh(16, 32)       # ~1k faces

    rng = np.random.RandomState(0)
    verts = jnp.asarray(np.repeat(verts_np[None], B, 0))
    faces = jnp.asarray(np.repeat(faces_np[None], B, 0))
    thetas = jnp.asarray(rng.uniform(-np.pi, np.pi, B).astype(np.float32))
    trans = jnp.asarray(
        np.stack([rng.uniform(-1, 1, B), rng.uniform(-0.5, 0.5, B),
                  -rng.uniform(5, 12, B)], 1).astype(np.float32))

    def step(verts, thetas, trans):
        q = y_rotation_quaternion(thetas)
        vcam, _ = perspective_transform(
            verts, scales=jnp.ones((B, 3)), rotations=q, translations=trans,
            perspective_translations=trans, zoom_tos=jnp.full((B, 1), 0.5))
        sil = render(vcam, faces, RenderType.Silhouette,
                     image_size=image_size)
        nrm = render(vcam, faces, RenderType.Normal, image_size=image_size)
        dep = render(vcam, faces, RenderType.Depth, image_size=image_size)
        return sil, nrm, dep

    step_jit = jax.jit(step)
    out = step_jit(verts, thetas, trans)
    jax.block_until_ready(out)

    n_iters = 10
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = step_jit(verts, thetas, trans)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    objects_per_sec = B * n_iters / dt
    print(json.dumps({
        "metric": "batched multi-object 2.5D render throughput (sil+normal+depth, 256^2 AA)",
        "value": round(objects_per_sec, 2),
        "unit": "objects/s",
        "vs_baseline": round(objects_per_sec / REFERENCE_OBJECTS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
