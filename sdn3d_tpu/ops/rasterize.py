"""Differentiable triangle rasterizer (TPU-native).

Re-expression of the neural-mesh-renderer CUDA kernels in
geometric/neural_renderer/rasterize.py as XLA programs:

  * forward face-index/weight/depth maps  — NR-2 "safe" per-pixel semantics
    (rasterize.py:238-360): deterministic z-buffer via min-reduction over
    faces, earlier face wins ties.  No spin locks (NR-1) needed — the TPU
    formulation is deterministic by construction.
  * silhouette backward                   — NR-4 approximate edge gradient
    (rasterize.py:514-745), re-expressed densely: instead of per-thread
    boundary walks, every (face, edge, axis, pixel) contribution is computed
    in parallel and reduced.
  * depth backward                        — NR-6 analytic gradient
    (rasterize.py:791-844) via segment_sum scatter.

Conventions (identical to the reference):
  faces [B, F, 3, 3] with screen x, y in [-1, 1] and z in camera units;
  pixel centers at xp = (2*xi + 1 - is) / is; pixel-space vertex coords
  p = (v * is + is - 1) / 2; back faces culled when
  (y2-y0)*(x1-x0) < (y1-y0)*(x2-x0).

The `face_valid` mask supports padded mesh banks (absent in the reference,
which loops per mesh).
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_IMAGE_SIZE = 256
DEFAULT_ANTI_ALIASING = True
DEFAULT_NEAR = 0.1
DEFAULT_FAR = 100.0
DEFAULT_EPS = 1e-4

_f32 = jnp.float32


def _float0_like(x):
    return np.zeros(x.shape, dtype=jax.dtypes.float0)


def _frontface(faces: jnp.ndarray) -> jnp.ndarray:
    """faces [..., 3, 3] -> bool [...]; True when NOT backface-culled
    (rasterize.py:307)."""
    x0, y0 = faces[..., 0, 0], faces[..., 0, 1]
    x1, y1 = faces[..., 1, 0], faces[..., 1, 1]
    x2, y2 = faces[..., 2, 0], faces[..., 2, 1]
    return (y2 - y0) * (x1 - x0) >= (y1 - y0) * (x2 - x0)


def _face_inv(faces: jnp.ndarray, image_size: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Barycentric inverse matrices in pixel coordinates (rasterize.py:255-272).

    faces [..., 3, 3] -> (face_inv [..., 3, 3], nondegenerate [...]).
    """
    p = 0.5 * (faces[..., :2] * image_size + image_size - 1)  # [..., 3, 2]
    p0x, p0y = p[..., 0, 0], p[..., 0, 1]
    p1x, p1y = p[..., 1, 0], p[..., 1, 1]
    p2x, p2y = p[..., 2, 0], p[..., 2, 1]
    inv = jnp.stack([
        jnp.stack([p1y - p2y, p2x - p1x, p1x * p2y - p2x * p1y], axis=-1),
        jnp.stack([p2y - p0y, p0x - p2x, p2x * p0y - p0x * p2y], axis=-1),
        jnp.stack([p0y - p1y, p1x - p0x, p0x * p1y - p1x * p0y], axis=-1),
    ], axis=-2)
    denom = (p2x * (p0y - p1y) + p0x * (p1y - p2y) + p1x * (p2y - p0y))
    ok = denom != 0
    denom = jnp.where(ok, denom, 1.0)
    return inv / denom[..., None, None], ok


def _pixel_grid(image_size: int, dtype=_f32) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pixel-index grids xi, yi flattened to [P] (row-major: p = yi*is + xi)."""
    yi = jax.lax.broadcasted_iota(jnp.int32, (image_size, image_size), 0)
    xi = jax.lax.broadcasted_iota(jnp.int32, (image_size, image_size), 1)
    return xi.reshape(-1).astype(dtype), yi.reshape(-1).astype(dtype)


def _pick_chunk(num_faces: int, batch: int, pixels: int,
                budget: int = 1 << 22) -> int:
    """Face-chunk size so B*C*P intermediates stay ~`budget` elements."""
    c = max(1, budget // max(1, batch * pixels))
    return min(c, num_faces)


def _pad_faces(faces: jnp.ndarray, face_valid: jnp.ndarray, chunk: int):
    """Pad the face axis to a multiple of `chunk` with invalid faces at the
    end (keeps face indices stable for the backward pass)."""
    F = faces.shape[1]
    rem = (-F) % chunk
    if rem:
        faces = jnp.pad(faces, ((0, 0), (0, rem), (0, 0), (0, 0)))
        face_valid = jnp.pad(face_valid, ((0, 0), (0, rem)))
    return faces, face_valid


def rasterize_face_maps(
    faces: jnp.ndarray,
    face_valid: Optional[jnp.ndarray] = None,
    image_size: int = DEFAULT_IMAGE_SIZE,
    near: float = DEFAULT_NEAR,
    far: float = DEFAULT_FAR,
    return_face_inv: bool = True,
    return_weights: bool = True,
    impl: str = "auto",
    version: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Forward rasterization to per-pixel maps (non-differentiable primitive).

    faces: [B, F, 3, 3]; face_valid: [B, F] bool or None.
    impl: "pallas" (tiled TPU kernel), "xla" (portable scan), or "auto"
    (pallas on TPU when the size is tile-aligned).
    version: pallas kernel version override (None = SDN3D_RASTER_KERNEL
    env default).  version=1 is the bit-exact parity mode: per-pixel
    cross-product edge math identical to the XLA path; v3's reassociated
    edge coefficients flip ~1e-4 of boundary pixels on large meshes.
    Returns (face_index [B,H,W] int32 (-1 = background),
             weight     [B,H,W,3],
             depth      [B,H,W]  (background = far),
             face_inv   [B,H,W,3,3]).
    weight / face_inv are None when return_weights / return_face_inv are
    False — the silhouette/normal paths only need the hit map, and the
    attribute recomputation is ~30% of the forward cost at 512^2.
    """
    need_attrs = return_weights or return_face_inv
    if impl == "auto":
        on_tpu = jax.default_backend() in ("tpu", "axon")
        impl = "pallas" if (on_tpu and image_size % 128 == 0) else "xla"
    if impl in ("pallas", "pallas_interp"):
        from sdn3d_tpu.ops import rasterize_pallas as RP
        if version is None:
            version = RP.KERNEL_VERSION
        packed, aux, chunk_bbox, perm = RP.pack_faces(
            faces, face_valid, image_size, version=version)
        fi, depth = RP.rasterize_face_index_pallas(
            packed, aux, chunk_bbox, image_size, near, far,
            interpret=(impl == "pallas_interp"), version=version)
        if perm is not None:
            # face indices refer to Morton-sorted order; map back.
            hit = fi >= 0
            fi_flat = jax.vmap(lambda pb, fb: pb[fb])(
                perm, jnp.where(hit, fi, 0).reshape(fi.shape[0], -1))
            fi = jnp.where(hit, fi_flat.reshape(fi.shape), -1)
        w = inv = None
        if need_attrs:
            w, inv = RP.recompute_pixel_attributes(faces, fi, image_size)
        return fi, w, depth, inv if return_face_inv else None

    B, F = faces.shape[:2]
    P = image_size * image_size
    faces = faces.astype(_f32)
    if face_valid is None:
        face_valid = jnp.ones((B, F), bool)

    C = _pick_chunk(F, B, P)
    faces, face_valid = _pad_faces(faces, face_valid, C)
    F = faces.shape[1]
    n_chunks = F // C

    inv_all, nondeg = _face_inv(faces, image_size)
    ok_face = _frontface(faces) & nondeg & face_valid            # [B, F]

    xi, yi = _pixel_grid(image_size)                              # [P]
    xp = (2.0 * xi + 1 - image_size) / image_size
    yp = (2.0 * yi + 1 - image_size) / image_size

    faces_c = faces.reshape(B, n_chunks, C, 3, 3).transpose(1, 0, 2, 3, 4)
    inv_c = inv_all.reshape(B, n_chunks, C, 3, 3).transpose(1, 0, 2, 3, 4)
    ok_c = ok_face.reshape(B, n_chunks, C).transpose(1, 0, 2)

    init = (
        jnp.full((B, P), far, _f32),                # depth_min
        jnp.full((B, P), -1, jnp.int32),            # face_index_min
        jnp.zeros((B, P, 3), _f32) if need_attrs else jnp.zeros((), _f32),
        (jnp.zeros((B, P, 3, 3), _f32) if need_attrs
         else jnp.zeros((), _f32)),
    )

    def step(carry, inputs):
        chunk_idx, f_chunk, inv_chunk, ok_chunk = inputs
        depth_min, idx_min, w_min, inv_min = carry

        v = f_chunk                                              # [B, C, 3, 3]
        x0, y0, z0 = v[..., 0, 0], v[..., 0, 1], v[..., 0, 2]
        x1, y1, z1 = v[..., 1, 0], v[..., 1, 1], v[..., 1, 2]
        x2, y2, z2 = v[..., 2, 0], v[..., 2, 1], v[..., 2, 2]

        def e(a):  # expand face scalar [B, C] -> [B, C, 1]
            return a[..., None]

        XP = xp[None, None, :]                                   # [1, 1, P]
        YP = yp[None, None, :]
        inside = (
            ((YP - e(y0)) * e(x1 - x0) >= (XP - e(x0)) * e(y1 - y0))
            & ((YP - e(y1)) * e(x2 - x1) >= (XP - e(x1)) * e(y2 - y1))
            & ((YP - e(y2)) * e(x0 - x2) >= (XP - e(x2)) * e(y0 - y2))
        )                                                        # [B, C, P]

        XI = xi[None, None, :]
        YI = yi[None, None, :]
        w0 = e(inv_chunk[..., 0, 0]) * XI + e(inv_chunk[..., 0, 1]) * YI + e(inv_chunk[..., 0, 2])
        w1 = e(inv_chunk[..., 1, 0]) * XI + e(inv_chunk[..., 1, 1]) * YI + e(inv_chunk[..., 1, 2])
        w2 = e(inv_chunk[..., 2, 0]) * XI + e(inv_chunk[..., 2, 1]) * YI + e(inv_chunk[..., 2, 2])
        w0 = jnp.clip(w0, 0.0, 1.0)
        w1 = jnp.clip(w1, 0.0, 1.0)
        w2 = jnp.clip(w2, 0.0, 1.0)
        w_sum = jnp.maximum(w0 + w1 + w2, 1e-12)
        w0, w1, w2 = w0 / w_sum, w1 / w_sum, w2 / w_sum

        zp = 1.0 / (w0 / e(z0) + w1 / e(z1) + w2 / e(z2))        # [B, C, P]
        ok = inside & ok_chunk[..., None] & (near < zp) & (zp < far)
        zp = jnp.where(ok, zp, far)

        # Min over chunk; ties -> earliest face (argmin picks first).
        best = jnp.argmin(zp, axis=1)                            # [B, P]
        bidx = jnp.arange(B)[:, None]
        pidx = jnp.arange(P)[None, :]
        z_best = zp[bidx, best, pidx]
        ok_best = ok[bidx, best, pidx]

        take = ok_best & (z_best < depth_min)
        gidx = (chunk_idx * C + best).astype(jnp.int32)

        depth_min = jnp.where(take, z_best, depth_min)
        idx_min = jnp.where(take, gidx, idx_min)
        if need_attrs:
            w_best = jnp.stack([w0[bidx, best, pidx],
                                w1[bidx, best, pidx],
                                w2[bidx, best, pidx]], axis=-1)  # [B, P, 3]
            inv_best = inv_chunk[bidx, best]                     # [B, P, 3, 3]
            w_min = jnp.where(take[..., None], w_best, w_min)
            inv_min = jnp.where(take[..., None, None], inv_best, inv_min)
        return (depth_min, idx_min, w_min, inv_min), None

    chunk_ids = jnp.arange(n_chunks)
    (depth, fidx, weight, finv), _ = jax.lax.scan(
        step, init, (chunk_ids, faces_c, inv_c, ok_c))

    hw = (B, image_size, image_size)
    return (fidx.reshape(hw),
            weight.reshape(hw + (3,)) if return_weights else None,
            depth.reshape(hw),
            finv.reshape(hw + (3, 3)) if return_face_inv else None)


# ---------------------------------------------------------------------------
# NR-4: approximate silhouette gradient — pixel-parallel re-expression
# ---------------------------------------------------------------------------

def _edge_invariants(u_all, v_all, d0, d1, hit, isz: int, axis: int,
                     e: int) -> dict:
    """Per-edge loop-invariant terms of the pixel-parallel NMR edge walk.

    u_all/v_all [B, S, L, 3]: the pixel's face's vertex coordinates along
    the d0 (cross) / d1 (walk) directions; d0/d1 the pixel coordinate
    grids in the same layout.  Shared by the XLA fori+roll loop and the
    Pallas halo kernel (rasterize_pallas.walk_grads_pallas) — one source
    of truth for the gate/distance math."""
    i0, i1, i2 = e, (e + 1) % 3, (e + 2) % 3
    Au, Bu, Cu = u_all[..., i0], u_all[..., i1], u_all[..., i2]
    Av, Bv, Cv = v_all[..., i0], v_all[..., i1], v_all[..., i2]

    nonvert = Bu != Au
    slope = (Bv - Av) / jnp.where(nonvert, Bu - Au, 1.0)
    d1_cross = slope * (d0 - Au) + Av
    if axis == 0:
        direction = jnp.where(Au < Bu, -1.0, 1.0)
    else:
        direction = jnp.where(Au < Bu, 1.0, -1.0)
    d1_in = jnp.where(direction > 0, jnp.floor(d1_cross),
                      jnp.ceil(d1_cross))
    d1_out = d1_in + direction

    col_ok = (hit & nonvert
              & (d0 >= jnp.ceil(jnp.minimum(Au, Bu)))
              & (d0 <= jnp.maximum(Au, Bu))
              & (d1_in >= 0) & (d1_in <= isz - 1)
              & (d1_out >= 0) & (d1_out <= isz - 1))

    # Distance factors with validity folded in as exact zeros
    # (kA = 0 <=> the reference's dist==0 skip): the walk body then needs
    # only 5 f32 + 1 bool invariant arrays per edge — the fori body is
    # HBM-bandwidth bound on its loop-invariant reads, so every array
    # dropped here is ~38 MB/step saved at 768^2 x 16.
    base_k = (Bu - Au) * 2.0 / isz
    kA = jnp.where(Bu != d0, base_k / jnp.where(Bu != d0, Bu - d0,
                                                1.0), 0.0)
    kB = jnp.where(Au != d0, base_k / jnp.where(Au != d0, d0 - Au,
                                                1.0), 0.0)

    # IN-pass range (the walked span inside the face).
    use_ac = (d0 - Au) * (d0 - Cu) < 0
    slope_ac = (Cv - Av) / jnp.where(Cu != Au, Cu - Au, 1.0)
    slope_bc = (Bv - Cv) / jnp.where(Bu != Cu, Bu - Cu, 1.0)
    d0_cross2 = jnp.where(use_ac, slope_ac * (d0 - Au) + Av,
                          slope_bc * (d0 - Cu) + Cv)
    d1_lim_in = jnp.where(direction > 0, jnp.ceil(d0_cross2),
                          jnp.floor(d0_cross2))
    lo_in = jnp.maximum(jnp.minimum(d1_in, d1_lim_in), 0.0)
    hi_in = jnp.minimum(jnp.maximum(d1_in, d1_lim_in), isz - 1.0)
    in_range = col_ok & (d1 >= lo_in) & (d1 <= hi_in)
    # pixel's walk distance to its in-boundary; -1 = not in range.
    j_gate = jnp.where(in_range, (d1_in - d1) * direction, -1.0)

    is_in_pixel = col_ok & (d1_in == d1)
    # lo_out/hi_out need no arrays: for an in-boundary pixel the out walk
    # [d1_out, border] is exactly {d1k : k>=1, 0 <= d1k <= isz-1}, an
    # in-loop test on d1k alone.
    return dict(i0=i0, i1=i1, d1_cross=d1_cross, direction=direction,
                kA=kA, kB=kB, j_gate=j_gate, is_in_pixel=is_in_pixel)


def _reduce_pixel_grads(faces, face_valid, face_index, hit, fi_c, comps,
                        zero, isz, B, F):
    """Reduce per-pixel contributions onto faces: grad -= diff/dist."""
    on_tpu = jax.default_backend() in ("tpu", "axon")
    if on_tpu and isz % 128 == 0:
        # One-hot matmul segmented reduction (Pallas/MXU): the XLA scatter
        # alternative below runs ~77M rows/s on v5e (~730 ms for the 6
        # components at 768^2 x 16) and dominates the whole backward.
        from sdn3d_tpu.ops import rasterize_pallas as RP
        planes = [-comps[(v, c)] for v in range(3) for c in range(2)]
        planes += [zero, zero]
        acc8 = jnp.stack(planes, axis=1)                    # [B, 8, H, W]
        _, nondeg = _face_inv(faces, isz)
        ok = _frontface(faces) & nondeg & face_valid
        aux, cb = RP.pack_seg_aux(faces, isz, ok)
        out = RP.segment_face_grads_pallas(acc8, face_index, aux, cb, isz)
        g = out[:, :F, :6].reshape(B, F, 3, 2)
    else:
        # Six SCALAR segment_sums: on v5e a [N, 6] row scatter measured
        # 1.8x slower than 6 independent [N] scatters (scatter cost is
        # per-row bound, and narrow multi-lane rows hit a slow path).
        seg = (fi_c + jnp.arange(B)[:, None, None] * F).reshape(-1)
        sums = [jax.ops.segment_sum(
            jnp.where(hit, -comps[(v, c)], 0.0).reshape(-1), seg,
            num_segments=B * F)
            for v in range(3) for c in range(2)]
        g = jnp.stack(sums, axis=-1).reshape(B, F, 3, 2)
    return jnp.concatenate([g, jnp.zeros((B, F, 3, 1), _f32)], axis=-1)


def _silhouette_grad_pixelwise(
    faces: jnp.ndarray,          # [B, F, 3, 3]
    face_valid: jnp.ndarray,     # [B, F] (culling only: fi already holds
                                 #         only valid faces)
    face_index: jnp.ndarray,     # [B, H, W] int32 (any consistent face
                                 #         order; pass Morton-sorted for a
                                 #         fast pixel->face reduction)
    alpha: jnp.ndarray,          # [B, H, W]
    grad_alpha: jnp.ndarray,     # [B, H, W]
    image_size: int,
    eps: float,
    walk: int = 0,
    force_walk_impl: Optional[str] = None,   # "pallas"/"xla"; tests only
) -> jnp.ndarray:
    """NMR edge gradient (rasterize.py:514-745), re-derived pixel-parallel.

    Key observation: every contribution in the reference's per-face edge
    walks is gated by a face-index-map test, which uniquely assigns it to a
    pixel whose OWN face is the walking face:
      * IN pass — the walked pixel p satisfies face_index[p] == f; p can
        compute the whole contribution from its own face's geometry.
      * OUT pass — the walk starts at an in-boundary pixel q with
        face_index[q] == f and d1_in(q) == q's coordinate; the walked
        pixels are q's column neighbours, reachable with shifted arrays.
    So the O(F * span * image) thread walks become O(P) elementwise work
    plus a `walk`-step shifted-accumulation loop and one segment-sum
    scatter — no loop over faces at all.

    walk: max walk length; 0 = image_size (exact reference semantics).
    Contributions decay as 1/dist, so small windows are accurate and much
    cheaper for training-sized images.  (With walk>0 BOTH passes are
    windowed — the IN pass's per-pixel distance j shares the same 1/dist
    decay as the OUT walk.)

    Hot-loop structure (v5e profile-driven): the IN pass's alpha_out is
    alpha at the pixel's d1_out — a per-pixel-dynamic gather that lowered
    to lane-crossing take_along_axis and dominated the backward (~0.75 s
    of 1.8 s at 768^2x16).  But alpha_out == the walk loop's rolled
    alpha at step k = j+1 (j = pixel's distance to its in-boundary), so
    the IN pass folds into the OUT walk gather-free, and one shared
    4-roll loop per axis serves all 3 edges.
    """
    B, F = faces.shape[:2]
    isz = image_size
    W = isz if walk <= 0 else min(walk, isz)

    hit = face_index >= 0
    fi_c = jnp.where(hit, face_index, 0)

    # Per-pixel gathered vertex coords (pixel space) of the pixel's face.
    pp_all = 0.5 * (faces[..., :2] * isz + isz - 1)       # [B, F, 3, 2]
    pp_px = jax.vmap(lambda pb, fb: pb[fb])(pp_all, fi_c)  # [B, H, W, 3, 2]

    yi = jax.lax.broadcasted_iota(_f32, (isz, isz), 0)[None]
    xi = jax.lax.broadcasted_iota(_f32, (isz, isz), 1)[None]

    # comps[(vert, comp)]: per-pixel gradient contribution to the pixel's
    # own face's vertex `vert`, coordinate `comp` (0=x, 1=y).
    zero = jnp.zeros((B, isz, isz), _f32)
    comps = {(v, c): zero for v in range(3) for c in range(2)}

    on_tpu = jax.default_backend() in ("tpu", "axon")
    if force_walk_impl == "pallas":
        use_pallas_walk = True
    elif force_walk_impl == "xla":
        use_pallas_walk = False
    else:
        use_pallas_walk = (on_tpu and isz % 128 == 0
                           and os.getenv("SDN3D_PALLAS_WALK", "1") == "1")

    if use_pallas_walk:
        # Halo-read Pallas kernel: alpha/grad stay in VMEM across the
        # whole k-loop instead of 4 rolled HBM planes per step; invariants
        # are read once.  Axis 1 (walk along columns) runs the same kernel
        # on transposed planes — walks must follow the sublane axis.
        from sdn3d_tpu.ops import rasterize_pallas as RP
        for axis in range(2):
            # One gather serves both axes: gather(pp, fi.T) is the spatial
            # transpose of gather(pp, fi), and transposing the 6 gathered
            # planes is pure bandwidth while the per-pixel gather is the
            # single most expensive primitive in the backward (~320 ms of
            # the 430 ms VJP at 768^2 x 16 when done per axis).
            if axis == 0:
                hit_l = hit
                alpha_l, grad_l = alpha, grad_alpha
                pp_l = pp_px
            else:
                hit_l = hit.transpose(0, 2, 1)
                alpha_l = alpha.transpose(0, 2, 1)
                grad_l = grad_alpha.transpose(0, 2, 1)
                pp_l = pp_px.transpose(0, 2, 1, 3, 4)
            u_all = pp_l[..., axis]          # d0-coordinate of vertices
            v_all = pp_l[..., 1 - axis]      # d1 (walk) coordinate
            d1 = jax.lax.broadcasted_iota(_f32, (isz, isz), 0)[None]
            d0 = jax.lax.broadcasted_iota(_f32, (isz, isz), 1)[None]
            planes = []
            for e in range(3):
                E = _edge_invariants(u_all, v_all, d0, d1, hit_l, isz,
                                     axis, e)
                planes += [E["d1_cross"], E["direction"], E["kA"], E["kB"],
                           E["j_gate"], E["is_in_pixel"].astype(_f32)]
            inv_stack = jnp.stack(planes, axis=1)   # [B, 18, S, L]
            accs = RP.walk_grads_pallas(alpha_l, grad_l, inv_stack, W, eps,
                                        interpret=not on_tpu)
            for v in range(3):
                a = accs[:, v]
                if axis == 1:
                    a = a.transpose(0, 2, 1)
                comps[(v, 1 - axis)] = comps[(v, 1 - axis)] + a
        return _reduce_pixel_grads(faces, face_valid, face_index, hit, fi_c,
                                   comps, zero, isz, B, F)

    for axis in range(2):
        if axis == 0:
            u_all = pp_px[..., 0]
            v_all = pp_px[..., 1]
            d0 = xi
            d1 = yi
            shift_axis = 1             # walk along rows (y)
        else:
            u_all = pp_px[..., 1]
            v_all = pp_px[..., 0]
            d0 = yi
            d1 = xi
            shift_axis = 2             # walk along cols (x)

        # Per-edge loop-invariant terms, precomputed so the k-loop's rolls
        # are shared across the 3 edges.
        edges = [_edge_invariants(u_all, v_all, d0, d1, hit, isz, axis, e)
                 for e in range(3)]

        def dist_terms(E, d1_at, diff, gate):
            dA = E["kA"] * (d1_at - E["d1_cross"])
            dA = jnp.where(dA > 0, dA + eps, dA - eps)
            dB = E["kB"] * (d1_at - E["d1_cross"])
            dB = jnp.where(dB > 0, dB + eps, dB - eps)
            gA = jnp.where(gate & (E["kA"] != 0), diff / dA, 0.0)
            gB = jnp.where(gate & (E["kB"] != 0), diff / dB, 0.0)
            return gA, gB

        def walk_step(k, accs):
            # NOTE: an unrolled static-shift variant (pad + slice per step)
            # was measured 7x slower to compile AND 3.6x slower to run than
            # this fori+roll form on the TPU backend.  The 4 rolls are the
            # only shifted reads; everything else is pixel-local.
            # Accumulators are PER VERTEX (3 arrays), not per edge endpoint
            # (6): edge e's A-grad and edge e-1's B-grad both belong to
            # vertex e, and the fori body's carried-array r/w traffic is a
            # large share of its HBM cost.
            kf = k.astype(_f32)
            a_fwd = jnp.roll(alpha, -k, axis=shift_axis)
            a_bwd = jnp.roll(alpha, k, axis=shift_axis)
            g_fwd = jnp.roll(grad_alpha, -k, axis=shift_axis)
            g_bwd = jnp.roll(grad_alpha, k, axis=shift_axis)
            accs = list(accs)
            for E in edges:
                pos = E["direction"] > 0
                a_k = jnp.where(pos, a_fwd, a_bwd)
                # ------- OUT: contributions land at the in-boundary pixel,
                # reading alpha/grad at distance k
                d1k = d1 + E["direction"] * kf
                in_seg = (d1k >= 0.0) & (d1k <= isz - 1.0)
                g_k = jnp.where(pos, g_fwd, g_bwd)
                diff = (a_k - alpha) * g_k
                gate = E["is_in_pixel"] & in_seg & (diff > 0)
                gA, gB = dist_terms(E, d1k, diff, gate)
                # ------- IN: pixels at walk distance j = k-1 read their
                # alpha_out (= a_k) here; grad is pixel-local.  (An
                # attempted hoist of this out of the loop via log-step
                # span propagation is INCORRECT under occlusion: an
                # occluded pixel's jump chain crosses pixels owned by the
                # occluder, whose span distances are inconsistent.)
                diff_in = (alpha - a_k) * grad_alpha
                gate_in = (E["j_gate"] == kf - 1.0) & (diff_in > 0)
                gA_in, gB_in = dist_terms(E, d1, diff_in, gate_in)
                accs[E["i0"]] = accs[E["i0"]] + gA + gA_in
                accs[E["i1"]] = accs[E["i1"]] + gB + gB_in
            return tuple(accs)

        accs = jax.lax.fori_loop(1, W + 1, walk_step, (zero, zero, zero))
        for v in range(3):
            comps[(v, 1 - axis)] = comps[(v, 1 - axis)] + accs[v]

    return _reduce_pixel_grads(faces, face_valid, face_index, hit, fi_c,
                               comps, zero, isz, B, F)


# ---------------------------------------------------------------------------
# NR-4: face-chunk dense variant (kept for cross-validation)
# ---------------------------------------------------------------------------

def _silhouette_grad(
    faces: jnp.ndarray,          # [B, F, 3, 3]
    face_valid: jnp.ndarray,     # [B, F]
    face_index: jnp.ndarray,     # [B, H, W] int32
    alpha: jnp.ndarray,          # [B, H, W]
    grad_alpha: jnp.ndarray,     # [B, H, W]
    image_size: int,
    eps: float,
) -> jnp.ndarray:
    """Dense NMR edge gradient for the alpha channel (rasterize.py:514-745).

    For every (face, edge, walk-axis) the reference walks boundary pixels
    along the edge and accumulates -diff_grad / dist into the two edge
    vertices' perpendicular coordinates.  Here the walk becomes a dense mask
    over the full pixel grid, reduced per chunk of faces.
    """
    B, F_orig = faces.shape[:2]
    isz = image_size
    fs = _f32

    C = max(1, min(F_orig, (1 << 22) // max(1, B * isz * isz)))
    faces, face_valid = _pad_faces(faces, face_valid, C)
    F = faces.shape[1]
    n_chunks = F // C

    front = _frontface(faces) & face_valid                       # [B, F]
    # Pixel-space 2D vertices [B, F, 3, 2]
    pp = 0.5 * (faces[..., :2] * isz + isz - 1)

    # Flatten maps
    alpha_f = alpha.reshape(B, isz * isz)
    fi_f = face_index.reshape(B, isz * isz)

    d0v = jnp.arange(isz, dtype=fs)                              # columns
    d1v = jnp.arange(isz, dtype=fs)                              # walk axis

    def per_axis(pp_e, chunk_base, axis):
        """pp_e: [B, C, 3, 2] pixel coords ordered (pi0, pi1, pi2) for one
        edge. Returns (gA, gB) [B, C] gradients for the two edge vertices'
        perpendicular coordinate.  axis 0: u=x, v=y; axis 1: u=y, v=x."""
        u = pp_e[..., (0 + axis) % 2]                            # [B, C, 3]
        vv = pp_e[..., (1 + axis) % 2]
        Au, Bu, Cu = u[..., 0], u[..., 1], u[..., 2]
        Av, Bv, Cv = vv[..., 0], vv[..., 1], vv[..., 2]

        if axis == 0:
            direction = jnp.where(Au < Bu, -1.0, 1.0)
        else:
            direction = jnp.where(Au < Bu, 1.0, -1.0)

        D0 = d0v[None, None, :]                                   # [1, 1, is]
        Au_, Bu_, Cu_ = Au[..., None], Bu[..., None], Cu[..., None]
        Av_, Bv_, Cv_ = Av[..., None], Bv[..., None], Cv[..., None]
        dir_ = direction[..., None]

        nonvert = (Bu != Au)[..., None]
        slope = (Bv_ - Av_) / jnp.where(nonvert, Bu_ - Au_, 1.0)
        d1_cross = slope * (D0 - Au_) + Av_                      # [B, C, is]
        d1_in = jnp.where(dir_ > 0, jnp.floor(d1_cross), jnp.ceil(d1_cross))
        d1_out = d1_in + dir_

        col_ok = (
            nonvert
            & (D0 >= jnp.ceil(jnp.minimum(Au_, Bu_)))
            & (D0 <= jnp.maximum(Au_, Bu_))
            & (d1_in >= 0) & (d1_in <= isz - 1)
            & (d1_out >= 0) & (d1_out <= isz - 1)
        )
        d1_in_c = jnp.clip(d1_in.astype(jnp.int32), 0, isz - 1)
        d1_out_c = jnp.clip(d1_out.astype(jnp.int32), 0, isz - 1)

        D0i = jnp.broadcast_to(d0v.astype(jnp.int32)[None, None, :], d1_in_c.shape)
        if axis == 0:
            pix_in = d1_in_c * isz + D0i
            pix_out = d1_out_c * isz + D0i
        else:
            pix_in = D0i * isz + d1_in_c
            pix_out = D0i * isz + d1_out_c

        def gather(m, idx):  # m [B, P], idx [B, C, is] -> [B, C, is]
            return jnp.take_along_axis(m[:, None, :], idx, axis=2)

        alpha_in = gather(alpha_f, pix_in)
        alpha_out = gather(alpha_f, pix_out)
        fi_in = gather(fi_f, pix_in)

        gid = (chunk_base + jnp.arange(C))[None, :, None]        # global face id
        is_own_in = fi_in == gid

        # IN-pass limit: crossing of the triangle's far boundary at this
        # column (rasterize.py:660-667).
        use_ac = (D0 - Au_) * (D0 - Cu_) < 0
        slope_ac = (Cv_ - Av_) / jnp.where((Cu != Au)[..., None], Cu_ - Au_, 1.0)
        slope_bc = (Bv_ - Cv_) / jnp.where((Bu != Cu)[..., None], Bu_ - Cu_, 1.0)
        d0_cross2 = jnp.where(use_ac,
                              slope_ac * (D0 - Au_) + Av_,
                              slope_bc * (D0 - Cu_) + Cv_)
        d1_lim_in = jnp.where(dir_ > 0, jnp.ceil(d0_cross2), jnp.floor(d0_cross2))
        lo_in = jnp.maximum(jnp.minimum(d1_in, d1_lim_in), 0.0)
        hi_in = jnp.minimum(jnp.maximum(d1_in, d1_lim_in), isz - 1.0)

        d1_lim_out = jnp.where(dir_ > 0, isz - 1.0, 0.0)
        lo_out = jnp.maximum(jnp.minimum(d1_out, d1_lim_out), 0.0)
        hi_out = jnp.minimum(jnp.maximum(d1_out, d1_lim_out), isz - 1.0)

        # Dense pixel grid along the walk axis: D1 [1,1,1,is]
        D1 = d1v[None, None, None, :]
        if axis == 0:
            # pixel (row=d1, col=d0): alpha map reshaped [B, 1, is(d1), is(d0)]
            amap = alpha.reshape(B, 1, isz, isz).transpose(0, 1, 2, 3)
            gmap = grad_alpha.reshape(B, 1, isz, isz)
            fmap = face_index.reshape(B, 1, isz, isz)
            # index [b, c, d1, d0]
            a_px = amap.transpose(0, 1, 2, 3)                     # [B,1,is,is]
            a_px = jnp.swapaxes(a_px, 2, 3)                       # -> [B,1,d0,d1]
            g_px = jnp.swapaxes(gmap, 2, 3)
            f_px = jnp.swapaxes(fmap, 2, 3)
        else:
            a_px = alpha.reshape(B, 1, isz, isz)                  # [B,1,d0,d1]
            g_px = grad_alpha.reshape(B, 1, isz, isz)
            f_px = face_index.reshape(B, 1, isz, isz)

        cross_ = d1_cross[..., None]                              # [B,C,is,1]

        base = (Bu_ - Au_)[..., None] * 2.0 / isz * (D1 - cross_)
        distA_ok = (Bu_ != D0)[..., None]
        distB_ok = (Au_ != D0)[..., None]
        distA = base / jnp.where(distA_ok, (Bu_ - D0)[..., None], 1.0)
        distB = base / jnp.where(distB_ok, (D0 - Au_)[..., None], 1.0)
        distA = jnp.where(distA > 0, distA + eps, distA - eps)
        distB = jnp.where(distB > 0, distB + eps, distB - eps)

        # OUT pass
        diff_out = (a_px - alpha_in[..., None]) * g_px
        m_out = (col_ok & is_own_in)[..., None] \
            & (D1 >= lo_out[..., None]) & (D1 <= hi_out[..., None]) \
            & (diff_out > 0)
        # IN pass
        diff_in = (a_px - alpha_out[..., None]) * g_px
        m_in = col_ok[..., None] \
            & (D1 >= lo_in[..., None]) & (D1 <= hi_in[..., None]) \
            & (f_px == gid[..., None]) & (diff_in > 0)

        cA = jnp.where(m_out & distA_ok, diff_out / distA, 0.0) \
            + jnp.where(m_in & distA_ok, diff_in / distA, 0.0)
        cB = jnp.where(m_out & distB_ok, diff_out / distB, 0.0) \
            + jnp.where(m_in & distB_ok, diff_in / distB, 0.0)

        gA = -jnp.sum(cA, axis=(2, 3))                            # [B, C]
        gB = -jnp.sum(cB, axis=(2, 3))
        return gA, gB

    def chunk_grad(chunk_idx):
        base = chunk_idx * C
        ppc = jax.lax.dynamic_slice_in_dim(pp, base, C, axis=1)   # [B,C,3,2]
        frc = jax.lax.dynamic_slice_in_dim(front, base, C, axis=1)
        g = jnp.zeros((B, C, 3, 3), fs)
        for e_ in range(3):
            order = [e_, (e_ + 1) % 3, (e_ + 2) % 3]
            pp_e = ppc[:, :, order, :]
            for axis in range(2):
                gA, gB = per_axis(pp_e, base, axis)
                comp = 1 - axis
                gA = jnp.where(frc, gA, 0.0)
                gB = jnp.where(frc, gB, 0.0)
                g = g.at[:, :, order[0], comp].add(gA)
                g = g.at[:, :, order[1], comp].add(gB)
        return g

    def scan_body(carry, chunk_idx):
        return carry, chunk_grad(chunk_idx)

    _, grads = jax.lax.scan(scan_body, 0, jnp.arange(n_chunks))
    # grads [n_chunks, B, C, 3, 3] -> [B, F, 3, 3]; drop the padding tail.
    return grads.transpose(1, 0, 2, 3, 4).reshape(B, F, 3, 3)[:, :F_orig]


# ---------------------------------------------------------------------------
# NR-6: analytic depth gradient
# ---------------------------------------------------------------------------

def _depth_grad(
    faces: jnp.ndarray,        # [B, F, 3, 3]
    face_index: jnp.ndarray,   # [B, H, W]
    depth: jnp.ndarray,        # [B, H, W]
    weight: jnp.ndarray,       # [B, H, W, 3]
    face_inv: jnp.ndarray,     # [B, H, W, 3, 3]
    grad_depth: jnp.ndarray,   # [B, H, W]
    image_size: int,
) -> jnp.ndarray:
    """Analytic depth gradient (rasterize.py:791-844) via segment_sum."""
    B, F = faces.shape[:2]
    P = image_size * image_size

    fi = face_index.reshape(B, P)
    d = depth.reshape(B, P)
    w = weight.reshape(B, P, 3)
    inv = face_inv.reshape(B, P, 3, 3)
    gd = grad_depth.reshape(B, P)

    hit = fi >= 0
    fi_c = jnp.where(hit, fi, 0)
    # Per-pixel face vertex z: gather faces[b, fi, :, 2]
    z = jnp.take_along_axis(faces[..., 2], fi_c[..., None], axis=1)  # [B,P,3]
    d2 = d * d

    # dz/dz_k = w_k * depth^2 / z_k^2
    gz = gd[..., None] * w * d2[..., None] / (z * z)                  # [B,P,3]

    # dz/d(x,y)_k = -grad * tmp_l * w_k * depth^2 * is/2,
    # tmp_l = -sum_m inv[m, l] / z_m
    tmp = -jnp.einsum("bpml,bpm->bpl", inv, 1.0 / z)                  # [B,P,3]
    gxy = (-gd[..., None, None]
           * tmp[:, :, None, :2]
           * w[..., None]
           * d2[..., None, None]
           * (image_size / 2.0))                                       # [B,P,3,2]

    gface_px = jnp.concatenate([gxy, gz[..., None]], axis=-1)          # [B,P,3,3]
    gface_px = jnp.where(hit[..., None, None], gface_px, 0.0)

    def scatter(one_b, one_fi):
        return jax.ops.segment_sum(one_b, one_fi, num_segments=F)

    return jax.vmap(scatter)(gface_px, fi_c)                           # [B,F,3,3]


# ---------------------------------------------------------------------------
# custom_vjp wrappers
# ---------------------------------------------------------------------------

def _rasterize_sorted(faces, face_valid, image_size: int, near: float,
                      far: float, version: Optional[int] = None,
                      colors: Optional[jnp.ndarray] = None):
    """(hit map, depth, perm[, rgb]) in Morton-SORTED face space (TPU
    pallas path), or original space elsewhere.

    Silhouette/depth/flat-color consumers never need original face ids in
    the map itself — skipping the un-permute gather saves a [B, P]
    lane-crossing gather per forward (~56 ms at 512^2 x 16), and the
    silhouette backward's pixel->face reduction gets Morton-coherent face
    groups (see segment_face_grads_pallas).  Per-face attributes can be
    permuted instead (F rows, not P).

    colors [B, F, 3] in [-1, 1]: also return a flat-shaded color map,
    PLANAR [B, 3, H, W], emitted by the v3 kernel in the same pass (the
    XLA colors[fi] gather it replaces costs ~150 ms at 512^2 x 16; the
    planar layout avoids a ~70 ms minor-axis relayout)."""
    on_tpu = jax.default_backend() in ("tpu", "axon")
    if on_tpu and image_size % 128 == 0:
        from sdn3d_tpu.ops import rasterize_pallas as RP
        if version is None:
            version = RP.KERNEL_VERSION
        with_color = colors is not None and version == 3
        packed, aux, chunk_bbox, perm = RP.pack_faces(
            faces, face_valid, image_size, version=version,
            colors=colors if with_color else None)
        outs = RP.rasterize_face_index_pallas(
            packed, aux, chunk_bbox, image_size, near, far, version=version,
            with_color=with_color)
        if colors is not None:
            if with_color:
                return outs[0], outs[1], perm, outs[2]
            rgb = _gather_face_colors(outs[0], colors, perm)
            return outs[0], outs[1], perm, rgb.transpose(0, 3, 1, 2)
        return outs[0], outs[1], perm
    fi, _, depth, _ = rasterize_face_maps(
        faces, face_valid, image_size, near, far, return_face_inv=False,
        return_weights=False, impl="xla")
    if colors is not None:
        rgb = _gather_face_colors(fi, colors, None)
        return fi, depth, None, rgb.transpose(0, 3, 1, 2)
    return fi, depth, None


def _gather_face_colors(fi: jnp.ndarray, colors: jnp.ndarray,
                        perm: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Portable colors[face_index] gather -> [B, H, W, 3]; background 0."""
    hit = fi >= 0
    fi_c = jnp.where(hit, fi, 0)
    if perm is not None:
        colors = jax.vmap(lambda cb, pb: cb[pb])(colors,
                                                 perm[:, :colors.shape[1]])
    rgb = jax.vmap(lambda cb, fb: cb[fb])(colors, fi_c)
    return jnp.where(hit[..., None], rgb, 0.0)


@functools.lru_cache(maxsize=None)
def _make_silhouette_fn(image_size: int, near: float, far: float, eps: float,
                        walk: int = 0, version: Optional[int] = None):
    @jax.custom_vjp
    def sil(faces, face_valid):
        fi, _, _ = _rasterize_sorted(faces, face_valid, image_size, near,
                                     far, version)
        return (fi >= 0).astype(_f32)

    def fwd(faces, face_valid):
        fi, _, perm = _rasterize_sorted(faces, face_valid, image_size,
                                        near, far, version)
        alpha = (fi >= 0).astype(_f32)
        return alpha, (faces, face_valid, fi, perm, alpha)

    def bwd(res, g):
        faces, face_valid, fi, perm, alpha = res
        if perm is not None:
            # fi is in sorted space: run the whole backward there, then
            # permute the face grads back (iota-scatter inverse + row
            # gather — cheaper than one [N, 9]-lane row scatter).
            F = faces.shape[1]
            pf = perm[:, :F]
            faces_s = jax.vmap(lambda fb, pb: fb[pb])(faces, pf)
            valid_s = jnp.take_along_axis(face_valid, pf, axis=1)
            gf_s = _silhouette_grad_pixelwise(faces_s, valid_s, fi, alpha,
                                              g, image_size, eps, walk=walk)
            iota = jnp.broadcast_to(jnp.arange(F, dtype=jnp.int32),
                                    pf.shape)
            inv = jnp.zeros_like(pf).at[
                jnp.arange(pf.shape[0])[:, None], pf].set(iota)
            gf = jax.vmap(lambda gs, ib: gs[ib])(gf_s, inv)
        else:
            gf = _silhouette_grad_pixelwise(faces, face_valid, fi, alpha, g,
                                            image_size, eps, walk=walk)
        return gf, _float0_like(face_valid)

    sil.defvjp(fwd, bwd)
    return sil


@functools.lru_cache(maxsize=None)
def _make_depth_fn(image_size: int, near: float, far: float,
                   version: Optional[int] = None):
    @jax.custom_vjp
    def dep(faces, face_valid):
        _, _, d, _ = rasterize_face_maps(
            faces, face_valid, image_size, near, far, version=version)
        return d

    def fwd(faces, face_valid):
        fi, w, d, inv = rasterize_face_maps(
            faces, face_valid, image_size, near, far, version=version)
        return d, (faces, face_valid, fi, d, w, inv)

    def bwd(res, g):
        faces, face_valid, fi, d, w, inv = res
        gf = _depth_grad(faces, fi, d, w, inv, g, image_size)
        return gf, _float0_like(face_valid)

    dep.defvjp(fwd, bwd)
    return dep


def _flip_rows(img: jnp.ndarray, spatial_axis: int) -> jnp.ndarray:
    return jnp.flip(img, axis=spatial_axis)


def _avg_pool2(img: jnp.ndarray) -> jnp.ndarray:
    """2x2 average pool on the last two dims."""
    s = img.shape
    r = img.reshape(s[:-2] + (s[-2] // 2, 2, s[-1] // 2, 2))
    return r.mean(axis=(-3, -1))


def rasterize_silhouettes(
    faces: jnp.ndarray,
    face_valid: Optional[jnp.ndarray] = None,
    image_size: int = DEFAULT_IMAGE_SIZE,
    anti_aliasing: bool = DEFAULT_ANTI_ALIASING,
    near: float = DEFAULT_NEAR,
    far: float = DEFAULT_FAR,
    eps: float = DEFAULT_EPS,
    grad_walk: int = 0,
    kernel_version: Optional[int] = None,
) -> jnp.ndarray:
    """Alpha maps [B, H, W] (rasterize.py:1008-1031): 2x supersampled when
    anti_aliasing, vertically flipped, average-pooled.

    grad_walk: out-walk window for the approximate silhouette gradient;
    0 = exact reference semantics (walk to the border).  Large training
    renders should pass ~48-64 (contributions decay as 1/dist).
    kernel_version: pallas kernel override; 1 = bit-exact parity mode
    (matches the XLA path exactly), None = env/default (v3, fast)."""
    size = image_size * 2 if anti_aliasing else image_size
    if face_valid is None:
        face_valid = jnp.ones(faces.shape[:2], bool)
    alpha = _make_silhouette_fn(size, near, far, eps, grad_walk,
                                kernel_version)(faces, face_valid)
    alpha = _flip_rows(alpha, 1)
    if anti_aliasing:
        alpha = _avg_pool2(alpha)
    return alpha


def rasterize_depth(
    faces: jnp.ndarray,
    face_valid: Optional[jnp.ndarray] = None,
    image_size: int = DEFAULT_IMAGE_SIZE,
    anti_aliasing: bool = DEFAULT_ANTI_ALIASING,
    near: float = DEFAULT_NEAR,
    far: float = DEFAULT_FAR,
    kernel_version: Optional[int] = None,
) -> jnp.ndarray:
    """Depth maps [B, H, W]; background = far (rasterize.py:1034-1057)."""
    size = image_size * 2 if anti_aliasing else image_size
    if face_valid is None:
        face_valid = jnp.ones(faces.shape[:2], bool)
    d = _make_depth_fn(size, near, far, kernel_version)(faces, face_valid)
    d = _flip_rows(d, 1)
    if anti_aliasing:
        d = _avg_pool2(d)
    return d


def rasterize_rgbad(
    faces: jnp.ndarray,
    textures: Optional[jnp.ndarray] = None,
    image_size: int = DEFAULT_IMAGE_SIZE,
    anti_aliasing: bool = DEFAULT_ANTI_ALIASING,
    near: float = DEFAULT_NEAR,
    far: float = DEFAULT_FAR,
    eps: float = DEFAULT_EPS,
    background_color: Tuple[float, float, float] = (0.0, 0.0, 0.0),
    face_valid: Optional[jnp.ndarray] = None,
    return_rgb: bool = True,
    return_alpha: bool = True,
    return_depth: bool = True,
) -> dict:
    """Full NMR entry point (rasterize.py:897-974): RGB via texture-cube
    sampling + alpha + depth, 2x supersampled, vertically flipped,
    average-pooled.  RGB is differentiable w.r.t. textures (NR-5 via
    autodiff); geometry gradients flow through alpha/depth custom VJPs."""
    from sdn3d_tpu.ops.textures import sample_textures

    size = image_size * 2 if anti_aliasing else image_size
    if face_valid is None:
        face_valid = jnp.ones(faces.shape[:2], bool)

    fi, w, d, _ = rasterize_face_maps(
        jax.lax.stop_gradient(faces), face_valid, size, near, far,
        return_face_inv=False)

    out = {"rgb": None, "alpha": None, "depth": None}
    if return_rgb:
        assert textures is not None
        rgb = sample_textures(jax.lax.stop_gradient(faces), textures, fi, w,
                              d, eps, background_color)   # [B, H, W, 3]
        rgb = jnp.moveaxis(rgb, -1, 1)                     # [B, 3, H, W]
        rgb = _flip_rows(rgb, 2)
        if anti_aliasing:
            rgb = _avg_pool2(rgb)
        out["rgb"] = rgb
    if return_alpha:
        alpha = _make_silhouette_fn(size, near, far, eps)(faces, face_valid)
        alpha = _flip_rows(alpha, 1)
        if anti_aliasing:
            alpha = _avg_pool2(alpha)
        out["alpha"] = alpha
    if return_depth:
        dep = _make_depth_fn(size, near, far)(faces, face_valid)
        dep = _flip_rows(dep, 1)
        if anti_aliasing:
            dep = _avg_pool2(dep)
        out["depth"] = dep
    return out


def rasterize_face_colors(
    faces: jnp.ndarray,
    colors: jnp.ndarray,
    face_valid: Optional[jnp.ndarray] = None,
    image_size: int = DEFAULT_IMAGE_SIZE,
    anti_aliasing: bool = DEFAULT_ANTI_ALIASING,
    near: float = DEFAULT_NEAR,
    far: float = DEFAULT_FAR,
    background: Tuple[float, float, float] = (0.0, 0.0, 0.0),
) -> jnp.ndarray:
    """Flat-shaded RGB render [B, 3, H, W] from per-face colors [B, F, 3].

    Replaces the reference's constant 2x2x2 texture-cube path used for normal
    maps (derender3d renderer.py:60-93 + NR-3 trilinear sampling, which is
    exact for face-constant textures).  Differentiable w.r.t. `colors`
    (gather autodiff); geometry gradients flow via the silhouette path.
    """
    size = image_size * 2 if anti_aliasing else image_size
    if face_valid is None:
        face_valid = jnp.ones(faces.shape[:2], bool)
    fi, _, perm = _rasterize_sorted(
        jax.lax.stop_gradient(faces), face_valid, size, near, far)
    hit = fi >= 0
    fi_c = jnp.where(hit, fi, 0)
    B = faces.shape[0]
    if perm is not None:
        # permute per-face colors instead of un-permuting the hit map
        colors = jax.vmap(lambda cb, pb: cb[pb])(
            colors, perm[:, :colors.shape[1]])
    rgb = jnp.take_along_axis(colors, fi_c.reshape(B, -1, 1), axis=1)
    rgb = rgb.reshape(B, size, size, 3)
    bg = jnp.asarray(background, _f32)
    rgb = jnp.where(hit[..., None], rgb, bg)
    rgb = rgb.transpose(0, 3, 1, 2)                   # [B, 3, H, W]
    rgb = _flip_rows(rgb, 2)
    if anti_aliasing:
        rgb = _avg_pool2(rgb)
    return rgb
