"""Pallas TPU rasterizer kernels.

Production forward path for the differentiable rasterizer: the XLA scan in
rasterize.py is the portable reference; this kernel implements the same
NR-2 "safe" per-pixel semantics (neural_renderer/rasterize.py:238-360) as a
tiled TPU program:

  grid = (batch, tile_rows, tile_cols, face_chunks)
  - the output face-index/depth tile lives in VMEM across the face-chunk
    axis (revisiting reduction grid);
  - each grid step streams one face chunk (packed SoA layout) into VMEM;
  - a whole chunk is skipped when its precomputed bounding box misses the
    tile (faces from an OBJ are spatially coherent, so chunk bboxes are
    tight) — this replaces the CUDA scanline kernel's per-face early exit;
  - within a chunk, faces are processed sequentially (strict `<` z-test —
    identical tie-breaking to the reference), each face predicated by its
    own bbox-vs-tile test; the per-pixel math is vectorized over the
    [TILE_H, TILE_W] pixel tile.

Weight / face_inv maps are NOT produced here; they are recomputed in XLA
from the face-index map (O(pixels), see `recompute_pixel_attributes`).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_f32 = jnp.float32

# Tile/chunk sizes from a TPU-v5e sweep on the ShapeNet-car workload
# (16 objects, 512^2): the kernel is scalar-loop bound, so large pixel
# tiles that amortize the per-face scalar work win — 64x128 is ~2x faster
# than 16x128.  image_size must divide by TILE_H (256/512/768 all do).
TILE_H = 64
TILE_W = 128
FACE_CHUNK = 128          # faces streamed per grid step
GROUP = 32                # faces per cull group inside a chunk
PER_FACE_CULL = True      # third culling level (per-face bbox scalar test)

# Packed face-data rows (SoA, [B, N_ROWS, F_pad]):
#  0..8   x0,y0,z0,x1,y1,z1,x2,y2,z2   (normalized coords)
#  9..17  face_inv (row-major, pixel coords)
#  18     ok flag (frontface & valid & nondegenerate)
#  19..22 bbox in pixel coords: xmin, xmax, ymin, ymax
#  23     padding
#  24..27 GROUP-level bbox (min/max over each aligned group of 16 faces,
#         value repeated across the group) — the second culling level
#  28..31 padding to a multiple of 8 rows
N_ROWS = 32
_BIG = 1e9


def _morton16(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Interleave two 16-bit ints into a 32-bit Morton code."""
    def spread(v):
        v = v & 0xFFFF
        v = (v | (v << 8)) & 0x00FF00FF
        v = (v | (v << 4)) & 0x0F0F0F0F
        v = (v | (v << 2)) & 0x33333333
        v = (v | (v << 1)) & 0x55555555
        return v
    return spread(x) | (spread(y) << 1)


def pack_faces(faces: jnp.ndarray, face_valid: Optional[jnp.ndarray],
               image_size: int, sort: bool = True
               ) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]]:
    """faces [B, F, 3, 3] -> (packed [B, N_ROWS, F_pad],
    chunk_bbox [B, 4, n_chunks], perm [B, F_pad] or None).

    With sort=True faces are Z-order (Morton) sorted by bbox center so the
    16-face cull groups cover tight 2D patches, and culled/invalid faces
    sink to the tail where whole chunks get skipped.  `perm` maps sorted
    index -> original face index (for un-permuting the face-index map)."""
    from sdn3d_tpu.ops.rasterize import _face_inv, _frontface

    B, F = faces.shape[:2]
    if face_valid is None:
        face_valid = jnp.ones((B, F), bool)

    inv, nondeg = _face_inv(faces, image_size)            # [B, F, 3, 3]
    ok = (_frontface(faces) & nondeg & face_valid).astype(_f32)

    perm = None
    if sort:
        cx = (faces[..., 0, 0] + faces[..., 1, 0] + faces[..., 2, 0]) / 3.0
        cy = (faces[..., 0, 1] + faces[..., 1, 1] + faces[..., 2, 1]) / 3.0
        qx = jnp.clip((cx * 0.5 + 0.5) * 1023.0, 0, 1023).astype(jnp.int32)
        qy = jnp.clip((cy * 0.5 + 0.5) * 1023.0, 0, 1023).astype(jnp.int32)
        key = jnp.where(ok > 0, _morton16(qx, qy), jnp.int32(0x7FFFFFFF))
        perm = jnp.argsort(key, axis=1).astype(jnp.int32)  # [B, F]
        faces = jax.vmap(lambda fb, pb: fb[pb])(faces, perm)
        inv = jax.vmap(lambda ib, pb: ib[pb])(inv, perm)
        ok = jnp.take_along_axis(ok, perm, axis=1)

    # Pixel-coord bbox of each face.
    px = 0.5 * (faces[..., 0] * image_size + image_size - 1)   # [B, F, 3]
    py = 0.5 * (faces[..., 1] * image_size + image_size - 1)
    big = jnp.float32(_BIG)
    xmin = jnp.where(ok > 0, jnp.min(px, -1), big)
    xmax = jnp.where(ok > 0, jnp.max(px, -1), -big)
    ymin = jnp.where(ok > 0, jnp.min(py, -1), big)
    ymax = jnp.where(ok > 0, jnp.max(py, -1), -big)

    # Pad the face axis first so group/chunk reductions see the fillers.
    pad = (-F) % FACE_CHUNK

    def padded(row, fill):
        return jnp.pad(row, ((0, 0), (0, pad)), constant_values=fill)

    xmin = padded(xmin, _BIG)
    xmax = padded(xmax, -_BIG)
    ymin = padded(ymin, _BIG)
    ymax = padded(ymax, -_BIG)

    def windowed(row, op_min, window):
        init = _BIG if op_min else -_BIG
        fn = jax.lax.min if op_min else jax.lax.max
        return jax.lax.reduce_window(row, jnp.float32(init), fn,
                                     (1, window), (1, window), "VALID")

    # Two-level cull hierarchy, both built from small windows (a single
    # FACE_CHUNK-wide reduce_window overflows scoped VMEM on this backend).
    g_xmin = windowed(xmin, True, GROUP)
    g_xmax = windowed(xmax, False, GROUP)
    g_ymin = windowed(ymin, True, GROUP)
    g_ymax = windowed(ymax, False, GROUP)

    # Slices, not reshapes: [B,F,3,3]->[B,F,9] reshapes compile ~100x
    # slower on this backend.
    rows = [padded(faces[:, :, k // 3, k % 3], 0.0) for k in range(9)]
    rows += [padded(inv[:, :, k // 3, k % 3], 0.0) for k in range(9)]
    rows += [padded(ok, 0.0), xmin, xmax, ymin, ymax,
             jnp.zeros((B, F + pad), _f32)]
    rows += [jnp.repeat(g_xmin, GROUP, axis=1),
             jnp.repeat(g_xmax, GROUP, axis=1),
             jnp.repeat(g_ymin, GROUP, axis=1),
             jnp.repeat(g_ymax, GROUP, axis=1)]
    rows += [jnp.zeros((B, F + pad), _f32)] * (N_ROWS - 28)
    packed = jnp.stack(rows, axis=1)                       # [B, N_ROWS, F_pad]

    gpc = FACE_CHUNK // GROUP
    chunk_bbox = jnp.stack([
        windowed(g_xmin, True, gpc),
        windowed(g_xmax, False, gpc),
        windowed(g_ymin, True, gpc),
        windowed(g_ymax, False, gpc),
    ], axis=1)                                             # [B, 4, n_chunks]
    if perm is not None:
        perm = jnp.pad(perm, ((0, 0), (0, pad)))
    return packed, chunk_bbox, perm


def _raster_kernel(bbox_ref, face_ref, fi_ref, depth_ref, *, image_size,
                   near, far):
    ty = pl.program_id(1)
    tx = pl.program_id(2)
    fc = pl.program_id(3)

    @pl.when(fc == 0)
    def _init():
        fi_ref[0] = jnp.full((TILE_H, TILE_W), -1, jnp.int32)
        depth_ref[0] = jnp.full((TILE_H, TILE_W), far, _f32)

    tile_y0 = (ty * TILE_H).astype(_f32)
    tile_x0 = (tx * TILE_W).astype(_f32)
    tile_y1 = tile_y0 + (TILE_H - 1)
    tile_x1 = tile_x0 + (TILE_W - 1)

    # Chunk-level cull: bbox of the whole face chunk vs this tile (scalars
    # from the SMEM chunk-bbox table).
    overlap = ((bbox_ref[0, 0, fc] <= tile_x1)
               & (bbox_ref[0, 1, fc] >= tile_x0)
               & (bbox_ref[0, 2, fc] <= tile_y1)
               & (bbox_ref[0, 3, fc] >= tile_y0))

    @pl.when(overlap)
    def _body():
        yi = jax.lax.broadcasted_iota(
            jnp.int32, (TILE_H, TILE_W), 0).astype(_f32) + tile_y0
        xi = jax.lax.broadcasted_iota(
            jnp.int32, (TILE_H, TILE_W), 1).astype(_f32) + tile_x0
        isz = jnp.float32(image_size)
        yp = (2.0 * yi + 1.0 - isz) / isz
        xp = (2.0 * xi + 1.0 - isz) / isz

        def face_body(j, carry):
            depth_min, idx_min = carry
            hit = face_ref[0, 18, j] > 0
            if PER_FACE_CULL:
                hit = (hit
                       & (face_ref[0, 19, j] <= tile_x1)
                       & (face_ref[0, 20, j] >= tile_x0)
                       & (face_ref[0, 21, j] <= tile_y1)
                       & (face_ref[0, 22, j] >= tile_y0))

            def compute():
                x0 = face_ref[0, 0, j]
                y0 = face_ref[0, 1, j]
                z0 = face_ref[0, 2, j]
                x1 = face_ref[0, 3, j]
                y1 = face_ref[0, 4, j]
                z1 = face_ref[0, 5, j]
                x2 = face_ref[0, 6, j]
                y2 = face_ref[0, 7, j]
                z2 = face_ref[0, 8, j]
                inside = (
                    ((yp - y0) * (x1 - x0) >= (xp - x0) * (y1 - y0))
                    & ((yp - y1) * (x2 - x1) >= (xp - x1) * (y2 - y1))
                    & ((yp - y2) * (x0 - x2) >= (xp - x2) * (y0 - y2))
                )
                w0 = (face_ref[0, 9, j] * xi + face_ref[0, 10, j] * yi
                      + face_ref[0, 11, j])
                w1 = (face_ref[0, 12, j] * xi + face_ref[0, 13, j] * yi
                      + face_ref[0, 14, j])
                w2 = (face_ref[0, 15, j] * xi + face_ref[0, 16, j] * yi
                      + face_ref[0, 17, j])
                w0 = jnp.clip(w0, 0.0, 1.0)
                w1 = jnp.clip(w1, 0.0, 1.0)
                w2 = jnp.clip(w2, 0.0, 1.0)
                ws = jnp.maximum(w0 + w1 + w2, 1e-12)
                zp = ws / (w0 / z0 + w1 / z1 + w2 / z2)
                take = inside & (near < zp) & (zp < far) & (zp < depth_min)
                gidx = fc * FACE_CHUNK + j
                return (jnp.where(take, zp, depth_min),
                        jnp.where(take, gidx, idx_min))

            return jax.lax.cond(hit, compute, lambda: carry)

        def group_body(g, carry):
            # Second culling level: skip whole 16-face groups whose bbox
            # misses the tile (rows 24..27, value constant per group).
            j0 = g * GROUP
            ghit = ((face_ref[0, 24, j0] <= tile_x1)
                    & (face_ref[0, 25, j0] >= tile_x0)
                    & (face_ref[0, 26, j0] <= tile_y1)
                    & (face_ref[0, 27, j0] >= tile_y0))

            def scan_group():
                return jax.lax.fori_loop(j0, j0 + GROUP, face_body, carry)

            return jax.lax.cond(ghit, scan_group, lambda: carry)

        depth1, idx1 = jax.lax.fori_loop(
            0, FACE_CHUNK // GROUP, group_body, (depth_ref[0], fi_ref[0]))
        depth_ref[0] = depth1
        fi_ref[0] = idx1


@functools.partial(jax.jit, static_argnames=("image_size", "near", "far",
                                             "interpret"))
def rasterize_face_index_pallas(
    packed: jnp.ndarray,
    chunk_bbox: jnp.ndarray,
    image_size: int,
    near: float = 0.1,
    far: float = 100.0,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(packed [B,24,F_pad], chunk_bbox [B,4,n_chunks]) ->
    (face_index [B,H,W] int32, depth [B,H,W]).

    image_size must be a multiple of TILE_W (128): true for every production
    size (256/512/768); pad otherwise before calling."""
    B, _, Fp = packed.shape
    assert Fp % FACE_CHUNK == 0
    assert image_size % TILE_W == 0 and image_size % TILE_H == 0
    n_chunks = Fp // FACE_CHUNK
    grid = (B, image_size // TILE_H, image_size // TILE_W, n_chunks)

    kernel = functools.partial(_raster_kernel, image_size=image_size,
                               near=near, far=far)

    fi, depth = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 4, n_chunks),
                         lambda b, ty, tx, fc: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, N_ROWS, FACE_CHUNK),
                         lambda b, ty, tx, fc: (b, 0, fc),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, TILE_H, TILE_W),
                         lambda b, ty, tx, fc: (b, ty, tx),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_H, TILE_W),
                         lambda b, ty, tx, fc: (b, ty, tx),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, image_size, image_size), jnp.int32),
            jax.ShapeDtypeStruct((B, image_size, image_size), _f32),
        ),
        interpret=interpret,
    )(chunk_bbox, packed)
    return fi, depth


def recompute_pixel_attributes(faces: jnp.ndarray, face_index: jnp.ndarray,
                               image_size: int
                               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Recompute (weight [B,H,W,3], face_inv [B,H,W,3,3]) from the hit map.

    O(pixels) XLA gather + arithmetic — replaces storing them from the
    kernel (the CUDA kernel writes them from the z-buffer winner,
    rasterize.py:343-349)."""
    from sdn3d_tpu.ops.rasterize import _face_inv

    B, F = faces.shape[:2]
    P = image_size * image_size
    inv_all, _ = _face_inv(faces, image_size)              # [B, F, 3, 3]

    fi = face_index.reshape(B, P)
    hit = fi >= 0
    fi_c = jnp.where(hit, fi, 0)
    # vmapped per-batch gather (reshape-free; see vertices_to_faces note).
    inv_px = jax.vmap(lambda inv_b, fi_b: inv_b[fi_b])(inv_all, fi_c)

    yi = jax.lax.broadcasted_iota(_f32, (image_size, image_size), 0)
    xi = jax.lax.broadcasted_iota(_f32, (image_size, image_size), 1)
    xi = xi.reshape(1, P)
    yi = yi.reshape(1, P)
    w = (inv_px[..., 0] * xi[..., None] + inv_px[..., 1] * yi[..., None]
         + inv_px[..., 2])                                 # [B, P, 3]
    w = jnp.clip(w, 0.0, 1.0)
    w = w / jnp.maximum(w.sum(-1, keepdims=True), 1e-12)
    w = jnp.where(hit[..., None], w, 0.0)
    inv_px = jnp.where(hit[..., None, None], inv_px, 0.0)
    hw = (B, image_size, image_size)
    return w.reshape(hw + (3,)), inv_px.reshape(hw + (3, 3))
