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
# Env overrides (SDN3D_RASTER_*) exist for hardware sweeps only.
import os as _os

TILE_H = int(_os.getenv("SDN3D_RASTER_TILE_H", "64"))
TILE_W = 128
# faces streamed per grid step; larger chunks amortize per-grid-step
# overhead (DMA descriptors + sequencing) at coarser chunk-level culling.
# v5e sweeps: 128 -> 1024 ~14% faster (v1); 1024 -> 2048 ~15% faster (v3).
FACE_CHUNK = int(_os.getenv("SDN3D_RASTER_FACE_CHUNK", "2048"))
GROUP = int(_os.getenv("SDN3D_RASTER_GROUP", "32"))
# third culling level (per-face bbox scalar test).  Essential for v1
# (each face pays a full-tile vector pass) but NET-NEGATIVE for v3 (the
# SMEM read + branch cost more than the slab work it skips inside
# Morton-compact groups: 287 -> 258 ms at 768^2 x16 without it).
PER_FACE_CULL = True
PER_FACE_CULL_V3 = _os.getenv("SDN3D_RASTER_FACE_CULL_V3", "0") == "1"

# Kernel version: 1 = scalar face loop over whole pixel tiles;
# 2 = 8 faces vectorized along sublanes x 128 pixels along lanes, looping
# only over each face group's pixel-row span.  v2 looked right on paper
# (v1 spends a whole 64x128-tile vector pass + ~150 scalar cycles per
# face that covers only a few pixels) but measured ~2.3x SLOWER on v5e:
# the data-dependent row loop (scalar-unit bound checks per trip) and the
# [1, W] dynamic-sublane read-modify-writes of the z-buffer dominate.
# Kept as a validated (identical hit maps) experiment for future Mosaic
# versions.
# 3 (default) = scalar face loop like v1, but (a) per-face screen math is
# precomputed edge COEFFICIENTS (e = A*yp + B*xp + C, and 1/z as another
# linear form — no divisions, no per-pixel vertex arithmetic), and (b) the
# vector pass covers only ALIGNED 8-row slabs of the face's row span
# (dynamic but 8-aligned z-buffer RMW) instead of the whole tile, so tiles
# can be tall (TILE_H3) which slashes per-(tile,group) cull overhead.
# v5e, 16-car 768^2: v3 215 ms vs v1 480 ms (2.2x); 512^2: 153 vs 308 ms.
# NOTE v3's reassociated edge math flips ~1e-4 of boundary pixels vs the
# per-pixel-vertex form (ULP sign changes on tiny edge values) — hit maps
# are not bit-identical to v1/XLA on large meshes, only near-identical.
KERNEL_VERSION = int(_os.getenv("SDN3D_RASTER_KERNEL", "3"))
VGROUP = 8                # faces per sublane-vectorized group (v2)
# v3 face-loop unrolling (the kernel is scalar-SEQUENCING bound at ~90
# cycles/face): fully unrolling the per-group face loop issues the 32
# faces' scalar reads back-to-back so the scalar unit pipelines across
# faces instead of serializing on each trip's bound check/branch.
# Pallas lowers fori_loop unroll only as FULL unroll (unroll ==
# num_steps), so the effective value is GROUP or 1.  v5e, 16 cars 768²:
# 631 -> 410 ms (1.54x), hit maps bit-identical
# (scripts/prof_unroll_sweep.py).  The slab loop stays rolled — its
# bounds are data-dependent (row span).
UNROLL_FACE_V3 = int(_os.getenv("SDN3D_RASTER_UNROLL_FACE", str(GROUP)))
if UNROLL_FACE_V3 != GROUP:
    UNROLL_FACE_V3 = 1
# v3 tile height cap: the best measured tile is the WHOLE image column
# (one tile row) — slab bounding makes tall tiles free and culling
# overhead scales with tile count.
TILE_H3 = int(_os.getenv("SDN3D_RASTER_TILE_H3", "1024"))

# Packed face-data rows (SoA f32, [B, N_ROWS, F_pad]):
#  0..8   x0,y0,rz0,x1,y1,rz1,x2,y2,rz2  (normalized coords; rz = 1/z)
#  9..15  padding to a multiple of 8 rows
# Barycentric weights are recovered in-kernel from the three edge
# functions already computed for the inside test (they are the same
# unnormalized barycentrics the reference's face_inv produces), so the 9
# face_inv rows the previous layout streamed per face are gone.
N_ROWS = 16

# Culling data (int32 SoA, [B, AUX_ROWS, F_pad]): bboxes quantized to TILE
# units and packed 4x8bit into ONE scalar — the cull test against a tile is
# exactly equivalent to the pixel-coord test, at 1 SMEM read instead of 4.
#  byte0 txmin, byte1 txmax+1 (exclusive), byte2 tymin, byte3 tymax+1.
#  Validity (frontface & nondegenerate & face_valid) is folded in as an
#  empty bbox (txmin=127, txmax+1=0); fields clamp to 127 to keep the
#  packed scalar non-negative.
#  row 0: per-face bbox;  row 1: GROUP-level bbox (repeated per group).
AUX_ROWS = 8
_BIG = 1e9


def _tile_h(version: int, image_size: int) -> int:
    """Tile height for a kernel version (v3 uses tall tiles — its vector
    pass is slab-bounded, not tile-bounded): the largest multiple of 8
    <= TILE_H3 that divides the image."""
    if version != 3:
        return TILE_H
    h = min(TILE_H3, image_size)
    while image_size % h:
        h -= 8
    return h


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
               image_size: int, sort: bool = True,
               version: Optional[int] = None,
               colors: Optional[jnp.ndarray] = None
               ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                          Optional[jnp.ndarray]]:
    """faces [B, F, 3, 3] -> (packed, aux [B, AUX_ROWS, F_pad] int32,
    chunk_bbox [B, 4, n_chunks] int32, perm [B, F_pad] or None).

    packed is [B, N_ROWS, F_pad] f32 for kernel v1 (SMEM scalar streaming)
    and [B, F_pad, 16] f32 for kernel v2 (VMEM, faces along sublanes).

    With sort=True faces are Z-order (Morton) sorted by bbox center so the
    cull groups cover tight 2D patches, and culled/invalid faces sink to
    the tail where whole chunks get skipped.  `perm` maps sorted index ->
    original face index (for un-permuting the face-index map).

    colors (optional, v3 only): per-face flat colors [B, F, 3] in [-1, 1],
    quantized to 3 x 10 bits and packed into aux row 3 — the kernel then
    emits a flat-shaded color map in the SAME pass (one extra int32 RMW
    plane), replacing the post-hoc colors[face_index] XLA gather that
    costs ~150 ms at 512^2 x 16 on v5e (per-pixel lane-crossing gathers
    are the slowest primitive on this hardware)."""
    from sdn3d_tpu.ops.rasterize import _face_inv, _frontface

    if version is None:
        version = KERNEL_VERSION
    tile_h = _tile_h(version, image_size)
    B, F = faces.shape[:2]
    if face_valid is None:
        face_valid = jnp.ones((B, F), bool)

    _, nondeg = _face_inv(faces, image_size)
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
        ok = jnp.take_along_axis(ok, perm, axis=1)
        if colors is not None:
            colors = jax.vmap(lambda cb, pb: cb[pb])(colors, perm)

    # Pixel-coord bbox of each face.
    px = 0.5 * (faces[..., 0] * image_size + image_size - 1)   # [B, F, 3]
    py = 0.5 * (faces[..., 1] * image_size + image_size - 1)
    big = jnp.float32(_BIG)
    xmin = jnp.where(ok > 0, jnp.min(px, -1), big)
    xmax = jnp.where(ok > 0, jnp.max(px, -1), -big)
    ymin = jnp.where(ok > 0, jnp.min(py, -1), big)
    ymax = jnp.where(ok > 0, jnp.max(py, -1), -big)

    # Quantize to TILE units: the kernel tests bboxes against whole tiles,
    # so tile granularity loses nothing; min indices floor, max indices
    # become exclusive tile ends.
    # Fields are clamped to 127 so the packed int32 never sets the sign
    # bit (the kernel unpacks the top field with a plain arithmetic shift).
    txmin = jnp.clip(jnp.floor(xmin / TILE_W), 0, 127).astype(jnp.int32)
    txmax = jnp.clip(jnp.floor(xmax / TILE_W) + 1, 0, 127).astype(jnp.int32)
    tymin = jnp.clip(jnp.floor(ymin / tile_h), 0, 127).astype(jnp.int32)
    tymax = jnp.clip(jnp.floor(ymax / tile_h) + 1, 0, 127).astype(jnp.int32)

    # Pad the face axis first so group/chunk reductions see the fillers
    # (empty bboxes).
    pad = (-F) % FACE_CHUNK

    def padded(row, fill):
        return jnp.pad(row, ((0, 0), (0, pad)), constant_values=fill)

    txmin = padded(txmin, 127)
    txmax = padded(txmax, 0)
    tymin = padded(tymin, 127)
    tymax = padded(tymax, 0)

    def windowed(row, op_min, window):
        init = jnp.int32(127 if op_min else 0)
        fn = jax.lax.min if op_min else jax.lax.max
        return jax.lax.reduce_window(row, init, fn,
                                     (1, window), (1, window), "VALID")

    def pack_bbox(a, b, c, d):
        return a | (b << 8) | (c << 16) | (d << 24)

    # Slices, not reshapes: [B,F,3,3]->[B,F,9] reshapes compile ~100x
    # slower on this backend.  z is stored as its reciprocal so the kernel
    # interpolates 1/z with FMAs and a single divide.
    rows = []
    if version == 3:
        # Edge-coefficient rows: e = A*yp + B*xp + C per edge, and the
        # interpolated reciprocal depth as another linear form
        # rz = Az*yp + Bz*xp + Cz (1/(2*area) folded in at pack time) —
        # the kernel does zero per-pixel vertex arithmetic and no divide.
        x0, y0 = faces[:, :, 0, 0], faces[:, :, 0, 1]
        x1, y1 = faces[:, :, 1, 0], faces[:, :, 1, 1]
        x2, y2 = faces[:, :, 2, 0], faces[:, :, 2, 1]
        rz_v = []
        for v in range(3):
            z = faces[:, :, v, 2]
            # invalid faces get rz=0 -> interpolated 1/z == 0, outside the
            # (1/far, 1/near) acceptance window (same trick as v2).
            rz_v.append(jnp.where(ok > 0, 1.0 / jnp.where(z != 0, z, 1.0),
                                  0.0))
        A01, B01, C01 = x1 - x0, -(y1 - y0), x0 * y1 - x1 * y0
        A12, B12, C12 = x2 - x1, -(y2 - y1), x1 * y2 - x2 * y1
        A20, B20, C20 = x0 - x2, -(y0 - y2), x2 * y0 - x0 * y2
        s = C01 + C12 + C20           # = e01+e12+e20, constant per face
        rs = 1.0 / jnp.where(s != 0, s, 1.0)
        Az = (A12 * rz_v[0] + A20 * rz_v[1] + A01 * rz_v[2]) * rs
        Bz = (B12 * rz_v[0] + B20 * rz_v[1] + B01 * rz_v[2]) * rs
        Cz = (C12 * rz_v[0] + C20 * rz_v[1] + C01 * rz_v[2]) * rs
        for r in (A01, B01, C01, A12, B12, C12, A20, B20, C20, Az, Bz, Cz):
            rows.append(padded(r, 0.0))
    else:
        for v in range(3):
            rows.append(padded(faces[:, :, v, 0], 0.0))
            rows.append(padded(faces[:, :, v, 1], 0.0))
            z = faces[:, :, v, 2]
            rz = 1.0 / jnp.where(z != 0, z, 1.0)
            if version >= 2:
                # v2 has no per-face validity test in the kernel: invalid
                # faces (backfaces/padding) get rz=0, making their
                # interpolated 1/z exactly 0 — outside the (1/far, 1/near)
                # acceptance window.
                rz = jnp.where(ok > 0, rz, 0.0)
            rows.append(padded(rz, 0.0))

    zero_i = jnp.zeros((B, F + pad), jnp.int32)

    if version == 2:
        g = VGROUP
        g_txmin = windowed(txmin, True, g)
        g_txmax = windowed(txmax, False, g)
        g_tymin = windowed(tymin, True, g)
        g_tymax = windowed(tymax, False, g)
        # Pixel-precision y bounds for the row loop (16 bits each; ymax is
        # an exclusive end; invalid faces collapse to an empty range).
        # Clamp to 32767 so `packed >> 16` never sees the sign bit.
        pymin = jnp.clip(jnp.floor(ymin), 0, 32767).astype(jnp.int32)
        pymax = jnp.clip(jnp.floor(ymax) + 1, 0, 32767).astype(jnp.int32)
        pymin = padded(pymin, 32767)
        pymax = padded(pymax, 0)
        g_pymin = jax.lax.reduce_window(pymin, jnp.int32(32767), jax.lax.min,
                                        (1, g), (1, g), "VALID")
        g_pymax = jax.lax.reduce_window(pymax, jnp.int32(0), jax.lax.max,
                                        (1, g), (1, g), "VALID")
        rows += [jnp.zeros((B, F + pad), _f32)] * (16 - 9)
        packed = jnp.stack(rows, axis=2)               # [B, F_pad, 16]
        aux = jnp.stack(
            [pack_bbox(txmin, txmax, tymin, tymax),
             pack_bbox(jnp.repeat(g_txmin, g, axis=1),
                       jnp.repeat(g_txmax, g, axis=1),
                       jnp.repeat(g_tymin, g, axis=1),
                       jnp.repeat(g_tymax, g, axis=1)),
             (jnp.repeat(g_pymin, g, axis=1)
              | (jnp.repeat(g_pymax, g, axis=1) << 16))]
            + [zero_i] * (AUX_ROWS - 3), axis=1)       # [B, AUX_ROWS, F_pad]
        gpc = FACE_CHUNK // g
    elif version == 3:
        g_txmin = windowed(txmin, True, GROUP)
        g_txmax = windowed(txmax, False, GROUP)
        g_tymin = windowed(tymin, True, GROUP)
        g_tymax = windowed(tymax, False, GROUP)
        # Per-face pixel-precision row span for the slab loop (16 bits
        # each; pymax is an exclusive end; padding collapses to empty).
        pymin = jnp.clip(jnp.floor(ymin), 0, 32767).astype(jnp.int32)
        pymax = jnp.clip(jnp.floor(ymax) + 1, 0, 32767).astype(jnp.int32)
        pymin = padded(pymin, 32767)
        pymax = padded(pymax, 0)
        rows += [jnp.zeros((B, F + pad), _f32)] * (N_ROWS - 12)
        packed = jnp.stack(rows, axis=1)               # [B, N_ROWS, F_pad]
        if colors is not None:
            # 3 x 10-bit quantization of [-1, 1] flat colors (aux row 3);
            # the packed scalar stays positive (30 bits).  Max error
            # 1/1023 per channel vs the exact colors[face_index] gather —
            # below visual relevance, but it can flip the final uint8
            # normal-PNG byte by +-1 LSB on pixels whose exact value sits
            # within ~0.125/255 of a quantization boundary.  Bit-exactness
            # policy: parity runs use kernel version 1 (or the CPU path),
            # which takes the exact gather (_gather_face_colors); this
            # fused plane is the v3 fast path only.
            q = jnp.clip(jnp.round((colors + 1.0) * 511.5), 0, 1023
                         ).astype(jnp.int32)           # [B, F, 3]
            crow = padded(q[..., 0] | (q[..., 1] << 10) | (q[..., 2] << 20),
                          0)
        else:
            crow = zero_i
        aux = jnp.stack(
            [pack_bbox(txmin, txmax, tymin, tymax),
             pack_bbox(jnp.repeat(g_txmin, GROUP, axis=1),
                       jnp.repeat(g_txmax, GROUP, axis=1),
                       jnp.repeat(g_tymin, GROUP, axis=1),
                       jnp.repeat(g_tymax, GROUP, axis=1)),
             pymin | (pymax << 16), crow]
            + [zero_i] * (AUX_ROWS - 4), axis=1)       # [B, AUX_ROWS, F_pad]
        gpc = FACE_CHUNK // GROUP
    else:
        g_txmin = windowed(txmin, True, GROUP)
        g_txmax = windowed(txmax, False, GROUP)
        g_tymin = windowed(tymin, True, GROUP)
        g_tymax = windowed(tymax, False, GROUP)
        rows += [jnp.zeros((B, F + pad), _f32)] * (N_ROWS - 9)
        packed = jnp.stack(rows, axis=1)               # [B, N_ROWS, F_pad]
        aux = jnp.stack(
            [pack_bbox(txmin, txmax, tymin, tymax),
             pack_bbox(jnp.repeat(g_txmin, GROUP, axis=1),
                       jnp.repeat(g_txmax, GROUP, axis=1),
                       jnp.repeat(g_tymin, GROUP, axis=1),
                       jnp.repeat(g_tymax, GROUP, axis=1))]
            + [zero_i] * (AUX_ROWS - 2), axis=1)       # [B, AUX_ROWS, F_pad]
        gpc = FACE_CHUNK // GROUP

    chunk_bbox = jnp.stack(
        [pack_bbox(windowed(g_txmin, True, gpc),
                   windowed(g_txmax, False, gpc),
                   windowed(g_tymin, True, gpc),
                   windowed(g_tymax, False, gpc))]
        + [jnp.zeros((B, (F + pad) // FACE_CHUNK), jnp.int32)] * 3,
        axis=1)                                            # [B, 4, n_chunks]
    if perm is not None:
        perm = jnp.pad(perm, ((0, 0), (0, pad)))
    return packed, aux, chunk_bbox, perm


def _raster_kernel(bbox_ref, aux_ref, face_ref, fi_ref, depth_ref, *,
                   image_size, near, far):
    ty = pl.program_id(1)
    tx = pl.program_id(2)
    fc = pl.program_id(3)

    @pl.when(fc == 0)
    def _init():
        fi_ref[0] = jnp.full((TILE_H, TILE_W), -1, jnp.int32)
        depth_ref[0] = jnp.full((TILE_H, TILE_W), far, _f32)

    def bbox_hit(v):
        # One packed tile-unit bbox scalar (byte layout in pack_faces);
        # max bytes are exclusive tile ends, validity folds in as an
        # empty bbox.
        return (((v & 0xFF) <= tx) & (((v >> 8) & 0xFF) > tx)
                & (((v >> 16) & 0xFF) <= ty) & ((v >> 24) > ty))

    @pl.when(bbox_hit(bbox_ref[0, 0, fc]))
    def _body():
        tile_y0 = (ty * TILE_H).astype(_f32)
        tile_x0 = (tx * TILE_W).astype(_f32)
        yi = jax.lax.broadcasted_iota(
            jnp.int32, (TILE_H, TILE_W), 0).astype(_f32) + tile_y0
        xi = jax.lax.broadcasted_iota(
            jnp.int32, (TILE_H, TILE_W), 1).astype(_f32) + tile_x0
        isz = jnp.float32(image_size)
        yp = (2.0 * yi + 1.0 - isz) / isz
        xp = (2.0 * xi + 1.0 - isz) / isz

        def face_body(j, carry):
            depth_min, idx_min = carry
            hit = bbox_hit(aux_ref[0, 0, j]) if PER_FACE_CULL else True

            def compute():
                x0 = face_ref[0, 0, j]
                y0 = face_ref[0, 1, j]
                rz0 = face_ref[0, 2, j]
                x1 = face_ref[0, 3, j]
                y1 = face_ref[0, 4, j]
                rz1 = face_ref[0, 5, j]
                x2 = face_ref[0, 6, j]
                y2 = face_ref[0, 7, j]
                rz2 = face_ref[0, 8, j]
                # Edge functions double as unnormalized barycentrics
                # (e12 -> vertex 0, e20 -> vertex 1, e01 -> vertex 2) —
                # the same weights the reference's face_inv yields, so no
                # inv rows are streamed.
                e01 = (yp - y0) * (x1 - x0) - (xp - x0) * (y1 - y0)
                e12 = (yp - y1) * (x2 - x1) - (xp - x1) * (y2 - y1)
                e20 = (yp - y2) * (x0 - x2) - (xp - x2) * (y0 - y2)
                inside = (e01 >= 0) & (e12 >= 0) & (e20 >= 0)
                s = e01 + e12 + e20
                zden = e12 * rz0 + e20 * rz1 + e01 * rz2
                zp = s / jnp.where(zden != 0, zden, 1.0)
                take = inside & (near < zp) & (zp < far) & (zp < depth_min)
                gidx = fc * FACE_CHUNK + j
                return (jnp.where(take, zp, depth_min),
                        jnp.where(take, gidx, idx_min))

            return jax.lax.cond(hit, compute, lambda: carry)

        def group_body(g, carry):
            # Second culling level: skip whole GROUP-face spans whose bbox
            # misses the tile (aux row 1, value constant per group).
            j0 = g * GROUP

            def scan_group():
                return jax.lax.fori_loop(j0, j0 + GROUP, face_body, carry)

            return jax.lax.cond(bbox_hit(aux_ref[0, 1, j0]),
                                scan_group, lambda: carry)

        depth1, idx1 = jax.lax.fori_loop(
            0, FACE_CHUNK // GROUP, group_body, (depth_ref[0], fi_ref[0]))
        depth_ref[0] = depth1
        fi_ref[0] = idx1


def _raster_kernel_v2(bbox_ref, aux_ref, facevm_ref, fi_ref, depth_ref, *,
                      image_size, near, far):
    """8 faces along sublanes x TILE_W pixels along lanes; loops only over
    each face group's pixel-row span.  The depth buffer holds 1/z during
    the kernel (strict `>` test == the reference's strict `<` on z); the
    wrapper inverts it once at the end."""
    ty = pl.program_id(1)
    tx = pl.program_id(2)
    fc = pl.program_id(3)

    @pl.when(fc == 0)
    def _init():
        fi_ref[0] = jnp.full((TILE_H, TILE_W), -1, jnp.int32)
        depth_ref[0] = jnp.full((TILE_H, TILE_W), 1.0 / far, _f32)

    def bbox_hit(v):
        return (((v & 0xFF) <= tx) & (((v >> 8) & 0xFF) > tx)
                & (((v >> 16) & 0xFF) <= ty) & ((v >> 24) > ty))

    @pl.when(bbox_hit(bbox_ref[0, 0, fc]))
    def _body():
        tile_y0 = ty * TILE_H
        tile_x0 = (tx * TILE_W).astype(_f32)
        isz = jnp.float32(image_size)
        xi = jax.lax.broadcasted_iota(
            jnp.int32, (1, TILE_W), 1).astype(_f32) + tile_x0
        xp = (2.0 * xi + 1.0 - isz) / isz              # [1, W]
        rfar = jnp.float32(1.0 / far)
        rnear = jnp.float32(1.0 / near)

        def group_body(gi, carry):
            j0 = gi * VGROUP

            @pl.when(bbox_hit(aux_ref[0, 1, j0]))
            def _group():
                attrs = facevm_ref[0, pl.ds(j0, VGROUP), :]   # [8, 16]
                x0 = attrs[:, 0:1]
                y0 = attrs[:, 1:2]
                rz0 = attrs[:, 2:3]
                x1 = attrs[:, 3:4]
                y1 = attrs[:, 4:5]
                rz1 = attrs[:, 5:6]
                x2 = attrs[:, 6:7]
                y2 = attrs[:, 7:8]
                rz2 = attrs[:, 8:9]
                dx01 = x1 - x0
                dy01 = y1 - y0
                dx12 = x2 - x1
                dy12 = y2 - y1
                dx20 = x0 - x2
                dy20 = y0 - y2
                idx = (jax.lax.broadcasted_iota(jnp.int32, (VGROUP, 1), 0)
                       + (fc * FACE_CHUNK + j0))
                ib = jnp.broadcast_to(idx, (VGROUP, TILE_W))

                yb = aux_ref[0, 2, j0]
                r0 = jnp.maximum((yb & 0xFFFF) - tile_y0, 0)
                r1 = jnp.minimum((yb >> 16) - tile_y0, TILE_H)

                def row_body(r, c):
                    yif = (tile_y0 + r).astype(_f32)
                    yp = (2.0 * yif + 1.0 - isz) / isz        # scalar
                    e01 = (yp - y0) * dx01 - (xp - x0) * dy01  # [8, W]
                    e12 = (yp - y1) * dx12 - (xp - x1) * dy12
                    e20 = (yp - y2) * dx20 - (xp - x2) * dy20
                    inside = (e01 >= 0) & (e12 >= 0) & (e20 >= 0)
                    s = e01 + e12 + e20
                    zden = e12 * rz0 + e20 * rz1 + e01 * rz2
                    rz = zden / jnp.where(s != 0.0, s, 1.0)
                    take = inside & (rz > rfar) & (rz < rnear)
                    rzm = jnp.where(take, rz, 0.0)

                    def sel(z1, i1, z2, i2):
                        # prefer the FIRST (lower face index) on ties —
                        # the reference's sequential strict-< semantics
                        t = z1 >= z2
                        return jnp.where(t, z1, z2), jnp.where(t, i1, i2)

                    z, i = sel(rzm[0:4], ib[0:4], rzm[4:8], ib[4:8])
                    z, i = sel(z[0:2], i[0:2], z[2:4], i[2:4])
                    z, i = sel(z[0:1], i[0:1], z[1:2], i[1:2])  # [1, W]

                    dcur = depth_ref[0, pl.ds(r, 1), :]
                    icur = fi_ref[0, pl.ds(r, 1), :]
                    tk = z > dcur
                    depth_ref[0, pl.ds(r, 1), :] = jnp.where(tk, z, dcur)
                    fi_ref[0, pl.ds(r, 1), :] = jnp.where(tk, i, icur)
                    return c

                jax.lax.fori_loop(r0, r1, row_body, 0)

            return carry

        jax.lax.fori_loop(0, FACE_CHUNK // VGROUP, group_body, 0)


def _raster_kernel_v3(bbox_ref, aux_ref, face_ref, fi_ref, depth_ref,
                      *maybe_rgb, image_size, near, far, tile_h,
                      with_color=False, unroll=None):
    """Scalar face loop, slab-bounded vector pass.

    Per face: ~14 SMEM scalar reads (bbox, row span, 12 edge/depth
    coefficients), then for each ALIGNED 8-row slab overlapping the face's
    row span: edge tests + reciprocal-depth interpolation as pure FMAs on
    [8, TILE_W] vregs and one 8-aligned dynamic z-buffer RMW.  The depth
    buffer holds 1/z (strict `>` == the reference's strict `<` on z); the
    wrapper inverts once at the end.

    with_color: also emit the winning face's packed 10-bit flat color
    (aux row 3) into a third [tile_h, W] int32 plane — one extra RMW per
    slab, replacing the ~150 ms post-hoc XLA color gather."""
    rgb_ref = maybe_rgb[0] if with_color else None
    ty = pl.program_id(1)
    tx = pl.program_id(2)
    fc = pl.program_id(3)

    @pl.when(fc == 0)
    def _init():
        fi_ref[0] = jnp.full((tile_h, TILE_W), -1, jnp.int32)
        depth_ref[0] = jnp.full((tile_h, TILE_W), 1.0 / far, _f32)
        if with_color:
            rgb_ref[0] = jnp.zeros((tile_h, TILE_W), jnp.int32)

    def bbox_hit(v):
        return (((v & 0xFF) <= tx) & (((v >> 8) & 0xFF) > tx)
                & (((v >> 16) & 0xFF) <= ty) & ((v >> 24) > ty))

    @pl.when(bbox_hit(bbox_ref[0, 0, fc]))
    def _body():
        tile_y0 = ty * tile_h
        tile_x0 = (tx * TILE_W).astype(_f32)
        isz = jnp.float32(image_size)
        xi = jax.lax.broadcasted_iota(
            jnp.int32, (1, TILE_W), 1).astype(_f32) + tile_x0
        xp = (2.0 * xi + 1.0 - isz) / isz                  # [1, W]
        i8 = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
        rfar = jnp.float32(1.0 / far)
        rnear = jnp.float32(1.0 / near)

        def face_body(i, carry):
            j0_, carry_in = carry
            j = j0_ + i

            @pl.when(bbox_hit(aux_ref[0, 0, j]) if PER_FACE_CULL_V3
                     else (j >= 0))
            def _face():
                a01 = face_ref[0, 0, j]
                b01 = face_ref[0, 1, j]
                c01 = face_ref[0, 2, j]
                a12 = face_ref[0, 3, j]
                b12 = face_ref[0, 4, j]
                c12 = face_ref[0, 5, j]
                a20 = face_ref[0, 6, j]
                b20 = face_ref[0, 7, j]
                c20 = face_ref[0, 8, j]
                az = face_ref[0, 9, j]
                bz = face_ref[0, 10, j]
                cz = face_ref[0, 11, j]
                # x-dependent parts, hoisted out of the slab loop
                ex01 = b01 * xp                            # [1, W]
                ex12 = b12 * xp
                ex20 = b20 * xp
                exz = bz * xp
                gidx = jnp.full((8, TILE_W), fc * FACE_CHUNK + j, jnp.int32)
                if with_color:
                    gcol = jnp.full((8, TILE_W), aux_ref[0, 3, j], jnp.int32)

                yb = aux_ref[0, 2, j]
                r0 = jnp.maximum((yb & 0xFFFF) - tile_y0, 0)
                r1 = jnp.minimum((yb >> 16) - tile_y0, tile_h)

                def slab_body(s, c2):
                    o = s * 8
                    yif = (i8 + (tile_y0 + o)).astype(_f32)    # [8, 1]
                    yp = (2.0 * yif + 1.0 - isz) / isz
                    e01 = (a01 * yp + c01) + ex01              # [8, W]
                    e12 = (a12 * yp + c12) + ex12
                    e20 = (a20 * yp + c20) + ex20
                    rz = (az * yp + cz) + exz
                    inside = (e01 >= 0) & (e12 >= 0) & (e20 >= 0)
                    dcur = depth_ref[0, pl.ds(o, 8), :]
                    take = (inside & (rz > rfar) & (rz < rnear)
                            & (rz > dcur))
                    depth_ref[0, pl.ds(o, 8), :] = jnp.where(take, rz, dcur)
                    icur = fi_ref[0, pl.ds(o, 8), :]
                    fi_ref[0, pl.ds(o, 8), :] = jnp.where(take, gidx, icur)
                    if with_color:
                        ccur = rgb_ref[0, pl.ds(o, 8), :]
                        rgb_ref[0, pl.ds(o, 8), :] = jnp.where(take, gcol,
                                                               ccur)
                    return c2

                jax.lax.fori_loop(r0 // 8, (r1 + 7) // 8, slab_body, 0)

            return carry

        def group_body(g, carry):
            j0 = g * GROUP

            def scan_group():
                # static 0..GROUP bounds so the face loop can unroll
                u = UNROLL_FACE_V3 if unroll is None else unroll
                _, c = jax.lax.fori_loop(0, GROUP, face_body, (j0, carry),
                                         unroll=u)
                return c

            return jax.lax.cond(bbox_hit(aux_ref[0, 1, j0]),
                                scan_group, lambda: carry)

        jax.lax.fori_loop(0, FACE_CHUNK // GROUP, group_body, 0)


@functools.partial(jax.jit, static_argnames=("image_size", "near", "far",
                                             "interpret", "version",
                                             "with_color", "unroll"))
def rasterize_face_index_pallas(
    packed: jnp.ndarray,
    aux: jnp.ndarray,
    chunk_bbox: jnp.ndarray,
    image_size: int,
    near: float = 0.1,
    far: float = 100.0,
    interpret: bool = False,
    version: Optional[int] = None,
    with_color: bool = False,
    unroll: Optional[int] = None,
) -> Tuple[jnp.ndarray, ...]:
    """(packed (see pack_faces), aux [B,AUX_ROWS,F_pad] int32,
    chunk_bbox [B,4,n_chunks] int32) ->
    (face_index [B,H,W] int32, depth [B,H,W][, rgb [B,H,W,3] when
    with_color — flat colors from pack_faces(colors=...), v3 only]).

    image_size must be a multiple of TILE_W (128): true for every production
    size (256/512/768); pad otherwise before calling.

    version MUST be passed explicitly (it is a static jit arg; a None
    default resolved inside the trace would poison the jit cache when
    KERNEL_VERSION changes)."""
    if version is None:
        version = KERNEL_VERSION
    if version == 2:
        B, Fp, _ = packed.shape
    else:
        B, _, Fp = packed.shape
    tile_h = _tile_h(version, image_size)
    assert Fp % FACE_CHUNK == 0
    assert image_size % TILE_W == 0 and image_size % tile_h == 0
    n_chunks = Fp // FACE_CHUNK
    grid = (B, image_size // tile_h, image_size // TILE_W, n_chunks)

    assert not (with_color and version != 3), \
        "with_color is a v3-kernel feature"
    if version == 2:
        kernel = functools.partial(_raster_kernel_v2, image_size=image_size,
                                   near=near, far=far)
        packed_spec = pl.BlockSpec((1, FACE_CHUNK, 16),
                                   lambda b, ty, tx, fc: (b, fc, 0),
                                   memory_space=pltpu.VMEM)
    elif version == 3:
        kernel = functools.partial(_raster_kernel_v3, image_size=image_size,
                                   near=near, far=far, tile_h=tile_h,
                                   with_color=with_color, unroll=unroll)
        packed_spec = pl.BlockSpec((1, N_ROWS, FACE_CHUNK),
                                   lambda b, ty, tx, fc: (b, 0, fc),
                                   memory_space=pltpu.SMEM)
    else:
        kernel = functools.partial(_raster_kernel, image_size=image_size,
                                   near=near, far=far)
        packed_spec = pl.BlockSpec((1, N_ROWS, FACE_CHUNK),
                                   lambda b, ty, tx, fc: (b, 0, fc),
                                   memory_space=pltpu.SMEM)

    map_spec = pl.BlockSpec((1, tile_h, TILE_W),
                            lambda b, ty, tx, fc: (b, ty, tx),
                            memory_space=pltpu.VMEM)
    map_shape = (B, image_size, image_size)
    out_specs = [map_spec, map_spec]
    out_shape = [jax.ShapeDtypeStruct(map_shape, jnp.int32),
                 jax.ShapeDtypeStruct(map_shape, _f32)]
    if with_color:
        out_specs.append(map_spec)
        out_shape.append(jax.ShapeDtypeStruct(map_shape, jnp.int32))

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 4, n_chunks),
                         lambda b, ty, tx, fc: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, AUX_ROWS, FACE_CHUNK),
                         lambda b, ty, tx, fc: (b, 0, fc),
                         memory_space=pltpu.SMEM),
            packed_spec,
        ],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
    )(chunk_bbox, aux, packed)
    fi, depth = outs[0], outs[1]
    if version >= 2:
        # the v2/v3 kernels' buffers hold 1/z
        depth = jnp.where(fi >= 0, 1.0 / jnp.maximum(depth, 1e-30),
                          jnp.float32(far))
    if with_color:
        # unpack 3 x 10-bit [-1, 1] colors; background (fi < 0) -> 0.
        # PLANAR [B, 3, H, W] layout: stacking on axis 1 keeps every op on
        # full [H, W] lanes — the [B, H, W, 3] minor-axis stack measured
        # ~79 ms vs ~8 ms planar at 512^2 x 16 on v5e (3-wide minor dims
        # force lane-crossing relayouts).
        q = outs[2]
        hit = (fi >= 0)[:, None]
        rgb = jnp.stack([q & 0x3FF, (q >> 10) & 0x3FF, (q >> 20) & 0x3FF],
                        axis=1).astype(_f32) / 511.5 - 1.0
        rgb = jnp.where(hit, rgb, 0.0)                 # [B, 3, H, W]
        return fi, depth, rgb
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


# ---------------------------------------------------------------------------
# Backward: pixel->face segmented reduction (one-hot matmul on the MXU)
# ---------------------------------------------------------------------------
#
# The silhouette backward's per-pixel contributions (rasterize.py
# _silhouette_grad_pixelwise) must be reduced onto their pixel's face:
# grad_face[f, :] = sum_{p: face_index[p] == f} acc[p, :].  XLA lowers that
# to a row-scatter running ~77M rows/s on v5e (~730 ms for 6 components at
# 768^2 x 16).  Here the reduction is a Pallas kernel instead: for every
# 128-face group (original face order), build the one-hot (face x pixel)
# matrix from the face-index map over the group's bbox and contract it with
# the 8-plane acc maps on the MXU.  Group/chunk bboxes cull empty work.

SEG_GROUP = 128            # faces per one-hot matmul
SEG_CHUNK = 2048           # faces per output block


def pack_seg_aux(faces: jnp.ndarray, image_size: int,
                 ok: Optional[jnp.ndarray] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Culling aux for segment_face_grads_pallas (face order = whatever
    order the face-index map uses; pass Morton-SORTED faces for compact
    groups — original-order OBJ groups span ~25-50% of the object and
    measured SLOWER than the XLA scatter).

    faces [B, F, 3, 3] (projected, normalized coords) ->
      aux [B, 8, F_pad] int32: row 0 = per-SEG_GROUP packed x-tile bbox
        (byte0 txmin, byte1 txmax+1; y bytes unused=always hit), row 1 =
        per-SEG_GROUP pymin | pymax_excl << 16;
      chunk_bbox [B, 4, n_chunks] int32 (row 0 packed x-tile bbox).
    `ok` [B, F]: False faces get empty boxes (they never appear in the
    face-index map, so this is purely a culling win — with Morton order
    the invalid tail drops out as whole chunks).
    """
    B, F = faces.shape[:2]
    px = 0.5 * (faces[..., 0] * image_size + image_size - 1)
    py = 0.5 * (faces[..., 1] * image_size + image_size - 1)
    xmin, xmax = jnp.min(px, -1), jnp.max(px, -1)
    ymin, ymax = jnp.min(py, -1), jnp.max(py, -1)
    if ok is not None:
        big = jnp.float32(_BIG)
        xmin = jnp.where(ok, xmin, big)
        xmax = jnp.where(ok, xmax, -big)
        ymin = jnp.where(ok, ymin, big)
        ymax = jnp.where(ok, ymax, -big)

    txmin = jnp.clip(jnp.floor(xmin / TILE_W), 0, 127).astype(jnp.int32)
    txmax = jnp.clip(jnp.floor(xmax / TILE_W) + 1, 0, 127).astype(jnp.int32)
    pymin = jnp.clip(jnp.floor(ymin), 0, 32767).astype(jnp.int32)
    pymax = jnp.clip(jnp.floor(ymax) + 1, 0, 32767).astype(jnp.int32)

    pad = (-F) % SEG_CHUNK

    def padded(row, fill):
        return jnp.pad(row, ((0, 0), (0, pad)), constant_values=fill)

    txmin = padded(txmin, 127)
    txmax = padded(txmax, 0)
    pymin = padded(pymin, 32767)
    pymax = padded(pymax, 0)

    def windowed(row, op_min, window):
        init = jnp.int32(32767 if op_min else 0)
        fn = jax.lax.min if op_min else jax.lax.max
        return jax.lax.reduce_window(row, init, fn,
                                     (1, window), (1, window), "VALID")

    g_txmin = windowed(txmin, True, SEG_GROUP)
    g_txmax = windowed(txmax, False, SEG_GROUP)
    g_pymin = windowed(pymin, True, SEG_GROUP)
    g_pymax = windowed(pymax, False, SEG_GROUP)

    def rep(a):
        return jnp.repeat(a, SEG_GROUP, axis=1)

    zero_i = jnp.zeros((B, F + pad), jnp.int32)
    aux = jnp.stack(
        [rep(g_txmin | (g_txmax << 8)),
         rep(g_pymin | (g_pymax << 16))] + [zero_i] * 6, axis=1)

    gpc = SEG_CHUNK // SEG_GROUP
    chunk_bbox = jnp.stack(
        [windowed(g_txmin, True, gpc) | (windowed(g_txmax, False, gpc) << 8)]
        + [jnp.zeros((B, (F + pad) // SEG_CHUNK), jnp.int32)] * 3, axis=1)
    return aux, chunk_bbox


def _seg_kernel(bbox_ref, aux_ref, fi_ref, acc_ref, out_ref, *, image_size):
    # grid (B, n_chunks, n_xt): tx MUST be the fastest axis so each output
    # block (b, fc) is visited in ONE contiguous run — Pallas write-back
    # of a revisited-after-leaving block silently loses the accumulation
    # (observed on hardware; interpret mode does not model it).
    fc = pl.program_id(1)
    tx = pl.program_id(2)

    @pl.when(tx == 0)
    def _init():
        out_ref[0] = jnp.zeros((SEG_CHUNK, 8), jnp.float32)

    def x_hit(v):
        return ((v & 0xFF) <= tx) & (((v >> 8) & 0xFF) > tx)

    @pl.when(x_hit(bbox_ref[0, 0, fc]))
    def _chunk():
        def group_body(g, carry):
            j0 = g * SEG_GROUP

            @pl.when(x_hit(aux_ref[0, 0, j0]))
            def _group():
                yb = aux_ref[0, 1, j0]
                r0 = yb & 0xFFFF
                r1 = jnp.minimum(yb >> 16, image_size)
                base = fc * SEG_CHUNK + j0
                fids = (jax.lax.broadcasted_iota(
                    jnp.int32, (SEG_GROUP, 1), 0) + base)

                def slab_body(s, C):
                    o = s * 8
                    fi8 = fi_ref[0, pl.ds(o, 8), :]          # [8, W]
                    a8 = acc_ref[0, :, pl.ds(o, 8), :]       # [8c, 8, W]
                    for r in range(8):
                        row = fi8[r:r + 1, :]                 # [1, W]
                        onehot = (row == fids).astype(jnp.float32)
                        C = C + jax.lax.dot_general(
                            onehot, a8[:, r, :],
                            (((1,), (1,)), ((), ())),
                            precision=jax.lax.Precision.HIGHEST)
                    return C

                C = jax.lax.fori_loop(
                    r0 // 8, (r1 + 7) // 8, slab_body,
                    jnp.zeros((SEG_GROUP, 8), jnp.float32))
                cur = out_ref[0, pl.ds(j0, SEG_GROUP), :]
                out_ref[0, pl.ds(j0, SEG_GROUP), :] = cur + C

            return carry

        jax.lax.fori_loop(0, SEG_CHUNK // SEG_GROUP, group_body, 0)


@functools.partial(jax.jit, static_argnames=("image_size", "interpret"))
def segment_face_grads_pallas(
    acc8: jnp.ndarray,          # [B, 8, H, W] f32 (planes 6,7 zero)
    face_index: jnp.ndarray,    # [B, H, W] int32 (original face ids)
    aux: jnp.ndarray,           # [B, 8, F_pad] int32 (pack_seg_aux)
    chunk_bbox: jnp.ndarray,    # [B, 4, n_chunks] int32
    image_size: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """grad_face [B, F_pad, 8]: per-face sums of acc8 over the pixels whose
    face_index equals the face."""
    B = acc8.shape[0]
    Fp = aux.shape[2]
    n_chunks = Fp // SEG_CHUNK
    n_xt = image_size // TILE_W
    grid = (B, n_chunks, n_xt)

    return pl.pallas_call(
        functools.partial(_seg_kernel, image_size=image_size),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 4, n_chunks), lambda b, fc, tx: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, SEG_CHUNK), lambda b, fc, tx: (b, 0, fc),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, image_size, TILE_W),
                         lambda b, fc, tx: (b, 0, tx),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, image_size, TILE_W),
                         lambda b, fc, tx: (b, 0, 0, tx),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, SEG_CHUNK, 8),
                               lambda b, fc, tx: (b, fc, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Fp, 8), jnp.float32),
        interpret=interpret,
    )(chunk_bbox, aux, face_index, acc8)


# ---------------------------------------------------------------------------
# Silhouette-VJP walk loop (NR-4 edge walks) as a halo-read Pallas kernel
# ---------------------------------------------------------------------------

# Edge-invariant stack layout (per edge e: rows 6e..6e+5):
#   d1_cross, direction, kA, kB, j_gate, is_in_pixel (f32 0/1)
WALK_INV_ROWS = 18
# Row-tile sweep on v5e (512^2 x 16, walk=64; identical outputs):
# 256 -> 274 ms, 128 -> 174, 64 -> 148, 32 -> 132, 16 -> 177.  Small row
# tiles keep the per-cell working set (invariants + accumulators) small
# enough for the pipeline to double-buffer; the extra column re-reads are
# cheap (HBM is <1% utilized).  64 chosen over 32 to divide more sizes.
WALK_TILE_S = int(_os.getenv("SDN3D_WALK_TILE_S", "64"))
# unroll=n_steps (the only value Pallas supports besides 1) measured 12x
# SLOWER (1514 vs 123 ms) + VMEM-OOMs at tile_s 256 — keep rolled.
WALK_UNROLL = int(_os.getenv("SDN3D_WALK_UNROLL", "1"))


def _walk_kernel(alpha_ref, grad_ref, inv_ref, acc_ref, *,
                 n_steps, eps, tile_s, S, halo):
    """One (batch, lane-tile, row-tile) cell of the silhouette walk.

    The XLA formulation (_silhouette_grad_pixelwise's fori+roll loop) is
    HBM-bound: every step re-reads 4 full rolled alpha/grad planes plus
    ~6 invariant planes per edge from HBM (~38 MB each at 768^2 x 16).
    Here alpha/grad live in VMEM as one halo-padded column per lane tile
    and the k-loop's shifted reads are VMEM row-offset reads; invariants
    are read ONCE per tile.  Same math, same gates — bitwise-equal
    contributions (all f32 FMA-free adds/mults).
    """
    st = pl.program_id(2)
    s0 = st * tile_s

    d1 = (jax.lax.broadcasted_iota(jnp.int32, (tile_s, TILE_W), 0)
          + s0).astype(_f32)
    alpha0 = alpha_ref[0, pl.ds(halo + s0, tile_s), :]
    grad0 = grad_ref[0, pl.ds(halo + s0, tile_s), :]

    inv = [inv_ref[0, r] for r in range(WALK_INV_ROWS)]
    Sf = jnp.float32(S - 1)
    epsf = jnp.float32(eps)

    def body(k, accs):
        kf = k.astype(_f32)
        a_f = alpha_ref[0, pl.ds(halo + s0 + k, tile_s), :]
        a_b = alpha_ref[0, pl.ds(halo + s0 - k, tile_s), :]
        g_f = grad_ref[0, pl.ds(halo + s0 + k, tile_s), :]
        g_b = grad_ref[0, pl.ds(halo + s0 - k, tile_s), :]
        accs = list(accs)
        for e in range(3):
            d1_cross, direction, kA, kB, j_gate, is_in = inv[6 * e:6 * e + 6]
            pos = direction > 0
            a_k = jnp.where(pos, a_f, a_b)
            g_k = jnp.where(pos, g_f, g_b)
            d1k = d1 + direction * kf
            in_seg = (d1k >= 0.0) & (d1k <= Sf)
            diff = (a_k - alpha0) * g_k
            gate = (is_in > 0) & in_seg & (diff > 0)
            tA = kA * (d1k - d1_cross)
            tA = jnp.where(tA > 0, tA + epsf, tA - epsf)
            tB = kB * (d1k - d1_cross)
            tB = jnp.where(tB > 0, tB + epsf, tB - epsf)
            gA = jnp.where(gate & (kA != 0), diff / tA, 0.0)
            gB = jnp.where(gate & (kB != 0), diff / tB, 0.0)
            # IN pass at walk distance j = k-1 (alpha_out == a_k)
            diff_in = (alpha0 - a_k) * grad0
            gate_in = (j_gate == kf - 1.0) & (diff_in > 0)
            uA = kA * (d1 - d1_cross)
            uA = jnp.where(uA > 0, uA + epsf, uA - epsf)
            uB = kB * (d1 - d1_cross)
            uB = jnp.where(uB > 0, uB + epsf, uB - epsf)
            gA_in = jnp.where(gate_in & (kA != 0), diff_in / uA, 0.0)
            gB_in = jnp.where(gate_in & (kB != 0), diff_in / uB, 0.0)
            i0, i1 = e, (e + 1) % 3
            accs[i0] = accs[i0] + gA + gA_in
            accs[i1] = accs[i1] + gB + gB_in
        return tuple(accs)

    zero = jnp.zeros((tile_s, TILE_W), _f32)
    # Unrolling turns the (halo + s0 +- k) slice offsets into
    # base+constant forms Mosaic can fold into strided loads; the rolled
    # loop pays dynamic address generation on 4 VMEM reads per step
    # (measured 5% of VPU peak rolled).
    a0, a1, a2 = jax.lax.fori_loop(1, n_steps + 1, body, (zero, zero, zero),
                                   unroll=WALK_UNROLL)
    acc_ref[0, 0] = a0
    acc_ref[0, 1] = a1
    acc_ref[0, 2] = a2


@functools.partial(jax.jit, static_argnames=("n_steps", "eps", "interpret"))
def walk_grads_pallas(alpha: jnp.ndarray, grad_alpha: jnp.ndarray,
                      inv_stack: jnp.ndarray, n_steps: int, eps: float,
                      interpret: bool = False) -> jnp.ndarray:
    """Silhouette walk accumulators for ONE axis, walking along dim 1.

    alpha/grad_alpha [B, S, L]; inv_stack [B, WALK_INV_ROWS, S, L]
    (see _walk_kernel layout; L % 128 == 0).  Returns [B, 3, S, L]
    per-vertex accumulators (same values as the XLA fori+roll loop)."""
    B, S, L = alpha.shape
    assert L % TILE_W == 0, L
    tile_s = WALK_TILE_S
    while S % tile_s:
        tile_s //= 2
    halo = n_steps
    # zero halo padding: gates guarantee out-of-image reads are unused
    pad = ((0, 0), (halo, halo), (0, 0))
    alpha_p = jnp.pad(alpha, pad)
    grad_p = jnp.pad(grad_alpha, pad)

    grid = (B, L // TILE_W, S // tile_s)
    col_spec = pl.BlockSpec((1, S + 2 * halo, TILE_W),
                            lambda b, l, st: (b, 0, l),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_walk_kernel, n_steps=n_steps, eps=eps,
                          tile_s=tile_s, S=S, halo=halo),
        grid=grid,
        in_specs=[
            col_spec,
            col_spec,
            pl.BlockSpec((1, WALK_INV_ROWS, tile_s, TILE_W),
                         lambda b, l, st: (b, 0, st, l),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 3, tile_s, TILE_W),
                               lambda b, l, st: (b, 0, st, l),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 3, S, L), _f32),
        interpret=interpret,
    )(alpha_p, grad_p, inv_stack)
