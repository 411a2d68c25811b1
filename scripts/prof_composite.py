"""Split the inference render+composite jit: render_targets vs
composite_objects vs pack, 16 real cars at the benchmark config
(render 384 -> 768^2 AA raster, 375x1242 frame)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from sdn3d_tpu.geometry.assets import load_shapenet_bank
from sdn3d_tpu.models.derenderer import DeviceMeshBank, TargetType, render_blob
from sdn3d_tpu.pipelines import edit as edit_mod
from sdn3d_tpu.pipelines.derender_infer import _pack_frame_device

H, W, R, M = 375, 1242, 384, 16
bank = DeviceMeshBank.from_host(load_shapenet_bank(
    "/root/reference/geometric/assets"))
rng = np.random.RandomState(0)


def blob_for(salt):
    r = np.random.RandomState(salt)
    return {
        "_theta_deltas": jnp.asarray(r.randn(M, 2).astype(np.float32)),
        "_translation2ds": jnp.asarray(
            r.randn(M, 2).astype(np.float32) * 0.1),
        "_log_scales": jnp.asarray(np.zeros((M, 3), np.float32)),
        "_log_depths": jnp.asarray(
            np.full((M, 1), np.log(400.0), np.float32)),
        "_class_probs": jnp.asarray(
            np.full((M, 8), 1.0 / 8, np.float32)),
        "_ffd_coeffs": jnp.asarray(
            r.randn(M, 8, 64 * 3).astype(np.float32) * 0.01),
        "_roi_norms": jnp.asarray(
            np.tile(np.asarray([-0.1, -0.2, 0.1, 0.2], np.float32),
                    (M, 1))),
        "_mroi_norms": jnp.asarray(np.zeros((M, 2), np.float32)),
        "_droi_norms": jnp.asarray(
            np.full((M, 2), 0.3, np.float32)),
        "_focals": jnp.asarray(np.full((M, 1), 725.0, np.float32)),
    }


@jax.jit
def render_only(blob, bank, valid):
    return render_blob(blob, bank, TargetType.extend, 256, R,
                       training=False, obj_valid=valid)


@jax.jit
def comp_only(out, interests):
    return edit_mod.composite_objects(
        out["_masks"], out["_normals"], out["_depth_maps"],
        out["_center2ds"], out["_zooms"], out["_depths"], interests,
        height=H, width=W, render_size=R)


@jax.jit
def pack_only(out, inst, nrm, dep):
    return _pack_frame_device(out, inst, nrm, dep)


valid = jnp.asarray(np.ones(M, bool))
interests = jnp.asarray(np.ones(M, np.uint8))


def t(fn, *args):
    fn(*args)  # warm (args vary per call below)
    ts = []
    for i in range(4):
        t0 = time.perf_counter()
        r = jax.block_until_ready(fn(*args))
        # relay caches identical (program, inputs): materialize
        np.asarray(jax.tree_util.tree_leaves(r)[0])
        ts.append(time.perf_counter() - t0)
    return min(ts)


for salt in (1, 2):
    blob = blob_for(salt)
    out = jax.block_until_ready(render_only(blob, bank, valid))
    inst, nrm, dep = comp_only(out, interests)
    print(f"salt {salt}: render {t(render_only, blob, bank, valid)*1e3:.0f} ms"
          f"  composite {t(comp_only, out, interests)*1e3:.0f} ms"
          f"  pack {t(pack_only, out, inst, nrm, dep)*1e3:.0f} ms",
          flush=True)
