"""Edit engine: de-render -> apply JSON edit ops -> re-render -> composite.

Re-expression of the edit/compositing half of geometric/scripts/main.py:
  * operation->object matching by nearest projected center (:461-479)
  * modify/delete semantics (:488-514)
  * depth-sorted full-frame compositing of per-object renders (:541-622) —
    the reference's PIL paste loops become one batched bilinear resample +
    over-composite on device.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sdn3d_tpu.data.vkitti import Camera


def match_operations(mroi_norms: np.ndarray, operations: List[dict],
                     camera=Camera) -> List[Tuple[int, int]]:
    """Pair detected objects with edit operations by nearest projected
    center (main.py:468-479).  Returns [(index_obj, index_op)].

    All detections participate — including interests==0 ones — exactly
    as the reference matches against every `_mroi_norms` row."""
    if not operations:
        return []
    op_centers = np.asarray([
        [(float(op["from"]["v"]) - camera.v0) / camera.focal,
         (float(op["from"]["u"]) - camera.u0) / camera.focal]
        for op in operations], np.float32)
    diffs = ((mroi_norms[:, None, :] - op_centers[None, :, :]) ** 2).sum(2)
    if len(mroi_norms) < len(op_centers):
        index_ops = diffs.argmin(axis=1)
        return [(i_obj, int(i_op)) for i_obj, i_op in enumerate(index_ops)]
    index_objs = diffs.argmin(axis=0)
    return [(int(i_obj), i_op) for i_op, i_obj in enumerate(index_objs)]


def apply_operations(blob: Dict[str, jnp.ndarray], interests: np.ndarray,
                     operations: List[dict],
                     pairs: List[Tuple[int, int]],
                     camera=Camera) -> Tuple[Dict[str, jnp.ndarray], np.ndarray]:
    """Apply modify/delete ops to the de-rendered state (main.py:485-514).

    Returns (updated blob, updated interests).  Pure host numpy: the op
    list is tiny and per-image, and the encode blob arrives as host
    arrays (derender_encode fetches it once per source) — doing the
    per-pair rewrites in numpy avoids any device round-trip on the
    edit/replay path.
    """
    theta_deltas = np.array(blob["_theta_deltas"])
    translation2ds = np.array(blob["_translation2ds"])
    log_depths = np.array(blob["_log_depths"])
    mroi = np.asarray(blob["_mroi_norms"])
    droi = np.asarray(blob["_droi_norms"])
    interests = interests.copy()

    for index_obj, index_op in pairs:
        op = operations[index_op]
        u = float(op["from"]["u"])
        v = float(op["from"]["v"])
        if op["type"] == "delete":
            interests[index_obj] = 0
        elif op["type"] == "modify":
            u = float(op["to"].get("u", u))
            v = float(op["to"].get("v", v))
            zoom = float(op["zoom"])
            ry = float(op["ry"])

            center = np.asarray([(v - camera.v0) / camera.focal,
                                 (u - camera.u0) / camera.focal],
                                np.float32)
            t2d = (center - mroi[index_obj]) / droi[index_obj]
            ld = log_depths[index_obj] - 2.0 * np.log(zoom)

            cos_r, sin_r = np.cos(-ry), np.sin(-ry)
            tc, ts = theta_deltas[index_obj, 0], theta_deltas[index_obj, 1]
            # in-place row assignment casts back to the blob's dtype
            theta_deltas[index_obj] = np.stack([tc * cos_r - ts * sin_r,
                                                ts * cos_r + tc * sin_r])
            translation2ds[index_obj] = t2d
            log_depths[index_obj] = ld

    out = dict(blob)
    out["_theta_deltas"] = theta_deltas
    out["_translation2ds"] = translation2ds
    out["_log_depths"] = log_depths
    return out, interests


def _interp_matrix(s: jnp.ndarray, R: int) -> jnp.ndarray:
    """1-D bilinear interpolation weights [len(s), R].

    Row i carries (1-w) at floor(s_i) and w at floor(s_i)+1 (indices
    clipped to the border like _bilinear_sample) and is zeroed outside
    the valid source range — so `W_y @ img @ W_x^T` equals the 2-D
    gather-based bilinear sample, computed as two dense matmuls on the
    MXU instead of 4 per-pixel gathers on the VPU (the gathers made the
    full-frame composite ~4x slower than the raster itself)."""
    valid = (s >= -0.5) & (s <= R - 0.5)
    s0 = jnp.floor(s)
    w = s - s0
    i0 = jnp.clip(s0.astype(jnp.int32), 0, R - 1)
    i1 = jnp.clip(i0 + 1, 0, R - 1)
    r = jax.lax.broadcasted_iota(jnp.int32, (s.shape[0], R), 1)
    mat = ((r == i0[:, None]) * (1.0 - w)[:, None]
           + (r == i1[:, None]) * w[:, None])
    return jnp.where(valid[:, None], mat, 0.0)


def _bilinear_sample(img: jnp.ndarray, sy: jnp.ndarray, sx: jnp.ndarray
                     ) -> jnp.ndarray:
    """img [C, R, R]; sy/sx [H, W] source coords -> [C, H, W]; zero outside."""
    R = img.shape[1]
    valid = (sy >= -0.5) & (sy <= R - 0.5) & (sx >= -0.5) & (sx <= R - 0.5)
    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    wy = sy - y0
    wx = sx - x0
    y0i = jnp.clip(y0.astype(jnp.int32), 0, R - 1)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, R - 1)
    y1i = jnp.clip(y0i + 1, 0, R - 1)
    x1i = jnp.clip(x0i + 1, 0, R - 1)

    def g(yy, xx):
        return img[:, yy, xx]                       # [C, H, W]

    top = g(y0i, x0i) * (1 - wx) + g(y0i, x1i) * wx
    bot = g(y1i, x0i) * (1 - wx) + g(y1i, x1i) * wx
    out = top * (1 - wy) + bot * wy
    return jnp.where(valid[None], out, 0.0)


def composite_objects(
    masks: jnp.ndarray,        # [N, 1, R, R]
    normals: jnp.ndarray,      # [N, 3, R, R]
    depth_maps: jnp.ndarray,   # [N, 1, R, R]
    center2ds: jnp.ndarray,    # [N, 2] (v_norm, u_norm)
    zooms: jnp.ndarray,        # [N, 1]
    depths: jnp.ndarray,       # [N, 1]
    interests: jnp.ndarray,    # [N] bool/int
    height: int = Camera.height,
    width: int = Camera.width,
    render_size: int = 384,
    focal: float = Camera.focal,
    u0: float = Camera.u0,
    v0: float = Camera.v0,
    method: str = "matmul",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Depth-sorted full-frame composite (main.py:541-622).

    Returns (instance_map [H, W] int32 (0 = bg, i+1 = object i),
             normal_map [3, H, W] (bg 0.5),
             depth_map [H, W] in [0, 1] (bg 1.0)).

    method="matmul" (default): every object's paste is sampled with
    separable bilinear interpolation as two dense f32 matmuls on the MXU
    (`_interp_matrix`), then the depth-sorted sequential overwrite is
    resolved in parallel — masks are binarized (round), so the loop's
    `(1-m)*prev + m*new` is exactly "the last pasted object with m == 1
    wins", i.e. an argmax over paste rank.  TPU-measured 868 ms -> MXU
    matmuls for the 16-object 375x1242 benchmark frame; the per-pixel
    values match the loop path to fp-associativity (instance maps
    measured identical — see tests/test_edit_pipeline.py).

    method="loop": the original gather-based fori_loop paste, kept as
    the associativity-exact reference path.

    Parity caveat: the matmul path's binarization (round of the
    interpolated mask) matches the loop path empirically (pinned at
    synthetic + serving shapes incl. masks seeded 1 ulp around 0.5,
    tests/test_edit_pipeline.py), but a value landing WITHIN 1 ulp of
    0.5 after a differently-fused interpolation could in principle round
    apart on a new backend.  Dumps that must be associativity-exact
    should pass method="loop".
    """
    N = masks.shape[0]
    order = jnp.argsort(-depths[:, 0])              # far to near
    R = masks.shape[-1]          # actual render resolution

    if method == "loop":
        yy = jax.lax.broadcasted_iota(jnp.float32, (height, width), 0)
        xx = jax.lax.broadcasted_iota(jnp.float32, (height, width), 1)

        inst = jnp.zeros((height, width), jnp.float32)
        nrm = jnp.full((3, height, width), 0.5, jnp.float32)
        dep = jnp.ones((1, height, width), jnp.float32)

        def paste(i, carry):
            inst, nrm, dep = carry
            k = order[i]
            size = jnp.floor(render_size / zooms[k, 0])
            cu = center2ds[k, 1] * focal + u0
            cv = center2ds[k, 0] * focal + v0
            left = jnp.floor(cu - jnp.floor(size / 2))  # int() trunc
            top = jnp.floor(cv - jnp.floor(size / 2))
            scale = R / size
            sy = (yy - top + 0.5) * scale - 0.5
            sx = (xx - left + 0.5) * scale - 0.5

            m = jnp.round(_bilinear_sample(masks[k], sy, sx))    # [1, H, W]
            m = m * (interests[k] > 0)
            n = _bilinear_sample(normals[k] / 2.0 + 0.5, sy, sx)
            d = _bilinear_sample(
                jnp.minimum(depth_maps[k] * zooms[k, 0] / 100.0, 1.0),
                sy, sx)

            inst = (1 - m[0]) * inst + m[0] * (k + 1).astype(jnp.float32)
            nrm = (1 - m) * nrm + m * n
            dep = (1 - m) * dep + m * d
            return inst, nrm, dep

        inst, nrm, dep = jax.lax.fori_loop(0, N, paste, (inst, nrm, dep))
        return inst.astype(jnp.int32), nrm, dep[0]

    yy1 = jnp.arange(height, dtype=jnp.float32)
    xx1 = jnp.arange(width, dtype=jnp.float32)

    def sample_all(k):
        size = jnp.floor(render_size / zooms[k, 0])
        cu = center2ds[k, 1] * focal + u0
        cv = center2ds[k, 0] * focal + v0
        left = jnp.floor(cu - jnp.floor(size / 2))      # int() trunc
        top = jnp.floor(cv - jnp.floor(size / 2))
        scale = R / size
        sy = (yy1 - top + 0.5) * scale - 0.5            # [H]
        sx = (xx1 - left + 0.5) * scale - 0.5           # [W]
        wy = _interp_matrix(sy, R)                      # [H, R]
        wx = _interp_matrix(sx, R)                      # [W, R]
        planes = jnp.concatenate([
            masks[k],
            normals[k] / 2.0 + 0.5,
            jnp.minimum(depth_maps[k] * zooms[k, 0] / 100.0, 1.0),
        ], axis=0)                                       # [5, R, R]
        s = jnp.einsum("hr,crq,wq->chw", wy, planes, wx,
                       precision=jax.lax.Precision.HIGHEST)
        m = jnp.round(s[0]) * (interests[k] > 0)         # binary
        return m, s[1:4], s[4]

    m_all, n_all, d_all = jax.vmap(sample_all)(jnp.arange(N))

    # sequential far->near overwrite with binary masks == per pixel,
    # the LAST pasted (nearest) object with m == 1 wins
    m_ord = m_all[order]                                 # [N, H, W]
    rank = jnp.arange(1, N + 1, dtype=m_ord.dtype)[:, None, None]
    score = m_ord * rank
    best = jnp.argmax(score, axis=0)                     # [H, W]
    has = jnp.max(score, axis=0) > 0
    slot = order[best]                                   # original index

    inst = jnp.where(has, slot + 1, 0).astype(jnp.int32)
    idx3 = jnp.broadcast_to(slot[None, None], (1, 3) + slot.shape)
    nrm_sel = jnp.take_along_axis(n_all, idx3, axis=0)[0]
    dep_sel = jnp.take_along_axis(d_all, slot[None], axis=0)[0]
    nrm = jnp.where(has[None], nrm_sel, 0.5)
    dep = jnp.where(has, dep_sel, 1.0)
    return inst, nrm, dep


def compute_interests(class_ids: np.ndarray, mask_areas: np.ndarray,
                      all_interested: bool = False) -> np.ndarray:
    """Which detections take part in the 3D path (main.py:344-352):
    car/van classes with mask area > 16*16."""
    if all_interested:
        return np.ones(len(class_ids), np.uint8)
    sel = np.isin(class_ids, [1, 2]) & (mask_areas > 16 * 16)
    return sel.astype(np.uint8)
