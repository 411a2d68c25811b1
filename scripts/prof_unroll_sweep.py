"""v3 kernel loop-unroll sweep on the real TPU.

The v3 forward kernel is scalar-SEQUENCING bound (~90 cycles/face,
NOTES_ROUND2); unrolling the face/slab fori_loops lets the scalar unit
pipeline several faces' SMEM reads past each loop's bound check.  This
driver re-execs itself with SDN3D_RASTER_UNROLL_{FACE,SLAB} set (the
knobs are read at module import) and times the production workload
(16 ShapeNet cars, winding-fold fill_back).

Usage: python scripts/prof_unroll_sweep.py [size]        # sweep
       SDN3D_SWEEP_CHILD=1 python ... [size]             # one cell
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_nums = [a for a in sys.argv[1:] if a.isdigit()]
SIZE = int(_nums[0]) if _nums else 768
B = 16


def child():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from sdn3d_tpu.geometry.assets import load_shapenet_bank
    from sdn3d_tpu.geometry.transforms import (perspective_transform,
                                               y_rotation_quaternion)
    from sdn3d_tpu.geometry import camera
    from sdn3d_tpu.ops import rasterize_pallas as RP
    from sdn3d_tpu.render.renderer import _fill_back

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
            verts, scales=jnp.ones((B, 3)), rotations=q,
            translations=trans, perspective_translations=trans,
            zoom_tos=jnp.full((B, 1), 0.5))
        vcam = vcam * jnp.asarray([-1.0, 1.0, 1.0])
        eye = jnp.zeros((B, 3))
        d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), (B, 3))
        up = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (B, 3))
        v = camera.look(vcam, eye, d, up)
        v = camera.perspective_divide(v, 30.0)
        ff, _ = _fill_back(faces_idx, None)
        return camera.vertices_to_faces(v, ff)

    fv = jax.block_until_ready(jax.jit(fv_fn)(verts, thetas, trans))
    packed, aux, cb, perm = jax.jit(
        lambda fv: RP.pack_faces(fv, None, SIZE, version=3))(fv)
    packed = jax.block_until_ready(packed)

    kern = lambda p: RP.rasterize_face_index_pallas(p, aux, cb, SIZE,
                                                    version=3)
    out = kern(packed)
    np.asarray(out[0])
    # vary inputs across iters (relay caches identical executions);
    # shifting coords by 1 ulp-ish does not change the workload shape
    iters = 6
    t0 = time.perf_counter()
    for i in range(iters):
        out = kern(packed + jnp.float32(1e-6 * (i + 1)))
    np.asarray(out[1])
    dt = (time.perf_counter() - t0) / iters * 1e3
    checksum = int((np.asarray(out[0]) >= 0).sum())
    print(json.dumps({
        "group": int(os.environ.get("SDN3D_RASTER_GROUP", "32")),
        "unroll": int(os.environ.get("SDN3D_RASTER_UNROLL_FACE", "1")),
        "ms": round(dt, 1), "hits": checksum}))


def interleaved():
    """Single-process interleaved rolled-vs-unrolled comparison — the
    only measurement the relay's run-to-run drift can't poison
    (subprocess cells measured 631 ms and 432 ms for the SAME config)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from sdn3d_tpu.ops import rasterize_pallas as RP

    fv = _build_fv()
    packed, aux, cb, _ = jax.jit(
        lambda fv: RP.pack_faces(fv, None, SIZE, version=3))(fv)
    packed = jax.block_until_ready(packed)

    def kern(p, unroll):
        return RP.rasterize_face_index_pallas(p, aux, cb, SIZE, version=3,
                                              unroll=unroll)

    for u in (1, RP.GROUP):
        np.asarray(kern(packed, u)[0])          # compile both
    times = {1: [], RP.GROUP: []}
    k = 0
    for _block in range(4):
        for u in (1, RP.GROUP):
            t0 = time.perf_counter()
            for _ in range(6):
                k += 1
                out = kern(packed + jnp.float32(1e-6 * k), u)
            np.asarray(out[1])
            times[u].append((time.perf_counter() - t0) / 6 * 1e3)
    o1, o2 = (np.asarray(kern(packed, u)[0]) for u in (1, RP.GROUP))
    print(json.dumps({
        "rolled_ms": [round(t, 1) for t in times[1]],
        "unrolled_ms": [round(t, 1) for t in times[RP.GROUP]],
        "rolled_med": round(float(np.median(times[1])), 1),
        "unrolled_med": round(float(np.median(times[RP.GROUP])), 1),
        "maps_equal": bool((o1 == o2).all())}))


def _build_fv():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from sdn3d_tpu.geometry.assets import load_shapenet_bank
    from sdn3d_tpu.geometry.transforms import (perspective_transform,
                                               y_rotation_quaternion)
    from sdn3d_tpu.geometry import camera
    from sdn3d_tpu.render.renderer import _fill_back

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
            verts, scales=jnp.ones((B, 3)), rotations=q,
            translations=trans, perspective_translations=trans,
            zoom_tos=jnp.full((B, 1), 0.5))
        vcam = vcam * jnp.asarray([-1.0, 1.0, 1.0])
        eye = jnp.zeros((B, 3))
        d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), (B, 3))
        up = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (B, 3))
        v = camera.look(vcam, eye, d, up)
        v = camera.perspective_divide(v, 30.0)
        ff, _ = _fill_back(faces_idx, None)
        return camera.vertices_to_faces(v, ff)

    return jax.block_until_ready(jax.jit(fv_fn)(verts, thetas, trans))


def main():
    if "--interleaved" in sys.argv:
        interleaved()
        return
    if os.environ.get("SDN3D_SWEEP_CHILD"):
        child()
        return
    # Pallas TPU lowers fori_loop unroll only as FULL unroll
    # (unroll == num_steps), so the sweep pairs GROUP with unroll=GROUP;
    # (32, 1) twice brackets the relay's run-to-run drift.
    cells = [(32, 1), (8, 8), (16, 16), (32, 32), (32, 1)]
    for group, face in cells:
        env = dict(os.environ,
                   SDN3D_SWEEP_CHILD="1",
                   SDN3D_RASTER_GROUP=str(group),
                   SDN3D_RASTER_UNROLL_FACE=str(face),
                   PYTHONPATH=REPO + os.pathsep
                   + os.environ.get("PYTHONPATH", ""))
        r = subprocess.run([sys.executable, os.path.abspath(__file__),
                            str(SIZE)], env=env, capture_output=True,
                           text=True, timeout=1800)
        line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
        print(line[-1] if line else f"FAIL group={group} face={face}: "
                                    f"{r.stderr[-300:]}", flush=True)


if __name__ == "__main__":
    main()
