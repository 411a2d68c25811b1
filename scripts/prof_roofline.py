"""Direct roofline numbers for the two hot Pallas kernels (VERDICT weak #1:
"scalar-loop bound" must be a number, not a claim).

Times each kernel in isolation with tiny fence outputs (an on-device sum)
so the dev relay's 22 MB/s D2H link is not billed to the kernel, then
reports achieved vs theoretical rates:
  - v3 raster forward: ns/face against the scalar-issue model (the kernel
    is a scalar loop over faces; HBM traffic is <1% of roofline);
  - silhouette walk: VPU ops/s against the v5e VPU peak (8x128 lanes x 2
    issue x ~0.94 GHz ~= 1.9 Tops f32), plus HBM GB/s for the planes read.

Usage: python scripts/prof_roofline.py [image_size] [walk] [--json OUT]

With --json the same measurements are written as a structured artifact
(ROOFLINE.json): VERDICT r4 item 6 — the geo.render ceiling defense must
live in a committed artifact with current numbers, not NOTES prose.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from sdn3d_tpu.geometry.assets import load_shapenet_bank
from sdn3d_tpu.geometry.transforms import (perspective_transform,
                                           y_rotation_quaternion)
from sdn3d_tpu.geometry import camera
from sdn3d_tpu.ops import rasterize as R
from sdn3d_tpu.ops import rasterize_pallas as RP

JSON_OUT = None
if "--json" in sys.argv:
    i = sys.argv.index("--json")
    JSON_OUT = sys.argv[i + 1] if len(sys.argv) > i + 1 else "ROOFLINE.json"
    del sys.argv[i:i + 2]
SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 512
WALK = int(sys.argv[2]) if len(sys.argv) > 2 else 64
B = 16
V5E_SCALAR_HZ = 0.94e9
V5E_VPU_OPS = 8 * 128 * 2 * 0.94e9     # f32 ops/s, fused-issue upper bound
V5E_HBM_GBS = 819.0


def fence(x):
    np.asarray(x)


def timeit(fn, *args, iters=6):
    # Warm up WITH the salt kwarg: jit bakes an unpassed default argument
    # in as a Python constant, so the first salted call retraces — warming
    # up with fn(*args) alone puts a ~9 s recompile inside the timing
    # loop and poisons the measurement (the source of this script's
    # earlier bogus 648-cycles/face figure).
    out = fn(*args, salt=1e-6)
    fence(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(*args, salt=1e-6 * (i + 2))
    fence(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / iters


def load_inputs():
    """Device-resident vcam + faces, passed as jit ARGS (closure-constant
    index arrays trigger pathological constant folding — see bench.py)."""
    bank = load_shapenet_bank("/root/reference/geometric/assets")
    nv, nf = int(bank.num_vertices[0]), int(bank.num_faces[0])
    rng = np.random.RandomState(0)
    verts = jnp.asarray(np.repeat(bank.vertices[0, :nv][None], B, 0))
    faces = jnp.asarray(np.repeat(bank.faces[0, :nf][None], B, 0))
    thetas = jnp.asarray(rng.uniform(-np.pi, np.pi, B).astype(np.float32))
    trans = jnp.asarray(np.stack(
        [rng.uniform(-1, 1, B), rng.uniform(-0.5, 0.5, B),
         -rng.uniform(5, 12, B)], 1).astype(np.float32))
    q = y_rotation_quaternion(thetas)
    vcam, _ = jax.jit(perspective_transform, static_argnames=())(
        verts, scales=jnp.ones((B, 3)), rotations=q, translations=trans,
        perspective_translations=trans, zoom_tos=jnp.full((B, 1), 0.5))
    return jax.block_until_ready(vcam), faces


def face_pipeline(vcam, faces):
    """Fixed-camera face pipeline exactly as fused render_targets
    (renderer.py:159-185): look+x-flip folded into one diag, elementwise
    perspective, and fill_back as a winding-reversal FOLD (face count
    stays F — the culled copy never wins a z-test).

    The pre-fix version of this script concatenated 2F fill_back faces
    instead: the back copies have mirrored bboxes that unsort the Morton
    order and double every cull structure, which inflated the measured
    kernel time ~10x vs the production path (879 ms vs ~80 ms at 512^2).
    Roofline numbers must be taken on the production pipeline."""
    vlook = vcam * jnp.asarray([1.0, 1.0, -1.0], vcam.dtype)
    fvl = camera.vertices_to_faces(vlook, faces)
    angle = jnp.asarray(30.0, vcam.dtype) / 180.0 * camera._REFERENCE_PI
    width = jnp.broadcast_to(jnp.atleast_1d(jnp.tan(angle))[:, None, None],
                             fvl.shape[:3])
    z = fvl[..., 2]
    fv = jnp.stack([fvl[..., 0] / z / width,
                    fvl[..., 1] / z / width, z], axis=-1)
    ccw = R._frontface(fv)
    return jnp.where(ccw[..., None, None], fv, fv[:, :, ::-1, :])


def main():
    vcam, faces = load_inputs()
    F = faces.shape[1]   # winding-fold fill_back keeps F faces
    print(f"workload: B={B} F={F} (winding-fold), raster {SIZE}^2,"
          f" walk={WALK}")

    # ---- v3 forward kernel (geom+pack+kernel from jit ARGS; the
    # [B, F, 3, 3] intermediate must stay INSIDE one jit — as a jit
    # boundary it pays a ~2 s minor-dim relayout at F=80k) ----
    @jax.jit
    def fwd(vcam, faces, salt=0.0):
        fv = face_pipeline(vcam + salt, faces)
        packed, aux, cb, perm = RP.pack_faces(fv, None, SIZE, version=3)
        fi, depth = RP.rasterize_face_index_pallas(packed, aux, cb, SIZE,
                                                   R.DEFAULT_NEAR,
                                                   R.DEFAULT_FAR, version=3)
        return (fi >= 0).sum(), depth.sum()

    @jax.jit
    def packonly(vcam, faces, salt=0.0):
        fv = face_pipeline(vcam + salt, faces)
        packed, aux, cb, perm = RP.pack_faces(fv, None, SIZE, version=3)
        return packed.sum(), aux.sum(), cb.sum()

    dt_pack = timeit(packonly, vcam, faces)
    dt_full = timeit(fwd, vcam, faces)
    print(f"geom+pack: {dt_pack*1e3:8.1f} ms; full: {dt_full*1e3:8.1f} ms")
    dt = dt_full - dt_pack
    Bv = B
    ns_face = dt / (Bv * F) * 1e9
    cycles = ns_face * V5E_SCALAR_HZ / 1e9
    # HBM traffic: packed 16 rows + aux 8 rows f32/int32 + fi/depth out
    hbm = (Bv * F * (16 + 8) * 4 + Bv * SIZE * SIZE * 8) / 1e9
    print(f"v3 raster fwd: {dt*1e3:8.1f} ms  -> {ns_face:6.1f} ns/face"
          f" = {cycles:5.0f} scalar cycles/face (scalar-issue bound);"
          f" HBM {hbm/dt:6.1f} GB/s = {hbm/dt/V5E_HBM_GBS*100:4.1f}% of peak")
    rows = {"workload": {"B": B, "F": int(F), "raster_size": SIZE,
                         "walk": WALK,
                         "device": jax.devices()[0].device_kind},
            "v3_raster_forward": {
                "geom_pack_ms": round(dt_pack * 1e3, 1),
                "full_ms": round(dt_full * 1e3, 1),
                "kernel_ms": round(dt * 1e3, 1),
                "ns_per_face": round(ns_face, 1),
                "scalar_cycles_per_face": round(cycles, 0),
                "bound": "scalar-issue (per-face sequencing on the "
                         "scalar core; VPU fill is per-face, HBM <1%)",
                "hbm_gb_per_s": round(hbm / dt, 1),
                "pct_hbm_peak": round(hbm / dt / V5E_HBM_GBS * 100, 2),
            }}

    # ---- silhouette walk kernel (one axis), production planes ----
    S = SIZE
    rng = np.random.RandomState(1)
    alpha = jnp.asarray((rng.rand(B, S, S) > 0.7).astype(np.float32))
    grad = jnp.asarray(rng.randn(B, S, S).astype(np.float32))
    inv = jnp.asarray(rng.randn(B, RP.WALK_INV_ROWS, S, S).astype(np.float32))

    @jax.jit
    def walk(alpha, grad, inv, salt=0.0):
        accs = RP.walk_grads_pallas(alpha, grad + salt, inv, WALK, 1e-3)
        return accs.sum()

    dt = timeit(walk, alpha, grad, inv)
    # ops: per pixel per step: 3 edges x ~26 vector ops (OUT+IN passes)
    ops = B * S * S * WALK * 3 * 26
    # HBM: alpha+grad columns re-read per row-tile; inv read once; accs out
    ts = RP.WALK_TILE_S
    while S % ts:
        ts //= 2
    reread = S // ts
    hbm = (B * S * S * 4 * 2 * reread + B * RP.WALK_INV_ROWS * S * S * 4
           + B * 3 * S * S * 4) / 1e9
    print(f"walk kernel 1 axis: {dt*1e3:8.1f} ms  ->"
          f" {ops/dt/1e12:5.2f} Tops/s = {ops/dt/V5E_VPU_OPS*100:4.1f}% of"
          f" VPU peak; HBM {hbm/dt:6.1f} GB/s"
          f" = {hbm/dt/V5E_HBM_GBS*100:4.1f}% of peak")
    rows["walk_kernel_one_axis"] = {
        "ms": round(dt * 1e3, 1),
        "tops_per_s": round(ops / dt / 1e12, 3),
        "pct_vpu_peak": round(ops / dt / V5E_VPU_OPS * 100, 1),
        "hbm_gb_per_s": round(hbm / dt, 1),
        "pct_hbm_peak": round(hbm / dt / V5E_HBM_GBS * 100, 1),
        "bound": "VPU (vector walk passes; alpha/grad re-reads per "
                 "row-tile keep HBM secondary)",
    }
    if JSON_OUT:
        rows["defense"] = (
            "geo.render's device phase is the v3 Pallas raster forward: "
            "a per-face scalar-sequenced kernel. Post-unroll it runs at "
            "the scalar_cycles_per_face above with HBM ~irrelevant; the "
            "per-face scalar sequencing (bbox -> tile loop setup per "
            "face) is the bound, so further gains need an algorithmic "
            "change (tile x face binning on the MXU, or pre-cull "
            "reducing F), not more unrolling. The silhouette-VJP walk "
            "kernel is VPU-bound at the fraction above. Measured on "
            "the production face pipeline (winding-fold fill_back).")
        with open(JSON_OUT, "w") as f:
            json.dump(rows, f, indent=2)
        print("wrote", JSON_OUT)


if __name__ == "__main__":
    main()
