"""PIL-convention uint8 resize as an on-device (jit) op, byte-exact.

The textural branch's conditioning pipeline downsizes the geometric
branch's full-resolution instance/normal maps with PIL
(`Image.resize` NEAREST / BICUBIC inside `textural_data.transform_image`
— reference textural/data/base_dataset.py:40-66).  In the fused serving
chain that forced a full-resolution (≈2.8 MB) device→host fetch per
frame just so the host could immediately throw 94% of the pixels away.

Pillow resizes 8-bit images with *integer fixed-point* convolution
(`libImaging/Resample.c`: coefficients rounded to int32 at
``PRECISION_BITS = 32 - 8 - 2`` bits, int32 accumulation seeded with a
rounding half, arithmetic-shift + clip to uint8, horizontal pass then
vertical pass with the intermediate clipped to uint8).  Integer
arithmetic is order-independent (two's-complement addition is
associative), so the same math on TPU/XLA reproduces Pillow's output
bit-for-bit — unlike a float reimplementation, where FMA contraction
could flip low bits.  NEAREST is a pure gather with Pillow's affine
center convention.

Byte-exactness against Pillow is pinned by tests/test_pil_resize.py for
both filters across shapes including the VKITTI 1242×375 → 624×192
serving geometry.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import numpy as np

PRECISION_BITS = 32 - 8 - 2          # Pillow Resample.c 8bpc precision


def _bicubic(x: float, a: float = -0.5) -> float:
    x = abs(x)
    if x < 1.0:
        return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0
    if x < 2.0:
        return (((x - 5.0) * x + 8.0) * x - 4.0) * a
    return 0.0


def _bilinear(x: float) -> float:
    x = abs(x)
    return 1.0 - x if x < 1.0 else 0.0


_FILTERS = {"bicubic": (_bicubic, 2.0), "bilinear": (_bilinear, 1.0)}


@functools.lru_cache(maxsize=None)
def coeffs_u8(in_size: int, out_size: int, method: str = "bicubic"
              ) -> Tuple[np.ndarray, np.ndarray]:
    """Pillow precompute_coeffs + 8bpc int conversion.

    Returns (idx [out, ksize] int32 source indices, ki [out, ksize] int32
    fixed-point weights; zero weight past each output pixel's support, so
    the padded gather contributes nothing).
    """
    filt, support0 = _FILTERS[method]
    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    support = support0 * filterscale
    ksize = int(np.ceil(support)) * 2 + 1
    idx = np.zeros((out_size, ksize), np.int32)
    kk = np.zeros((out_size, ksize), np.float64)
    for xx in range(out_size):
        center = (xx + 0.5) * scale
        ss = 1.0 / filterscale
        xmin = max(int(center - support + 0.5), 0)
        xmax = min(int(center + support + 0.5), in_size) - xmin
        ww = 0.0
        for x in range(xmax):
            w = filt((x + xmin - center + 0.5) * ss)
            kk[xx, x] = w
            ww += w
        if ww != 0.0:
            kk[xx, :xmax] /= ww
        idx[xx, :xmax] = xmin + np.arange(xmax)
        idx[xx, xmax:] = xmin            # in-bounds dummy (weight 0)
    # round-half-away-from-zero, exactly Pillow's (int)(±0.5 + k * 2^P)
    scaled = kk * (1 << PRECISION_BITS)
    ki = np.where(kk < 0, scaled - 0.5, scaled + 0.5).astype(np.int32)
    return idx, ki


@functools.lru_cache(maxsize=None)
def nearest_indices(in_size: int, out_size: int) -> np.ndarray:
    """Pillow NEAREST resize source index per output pixel.

    Pillow's ImagingScaleAffine ACCUMULATES the source position in a
    double (start at scale/2, += scale per pixel) rather than computing
    (x + 0.5) * scale — the accumulated drift flips indices where the
    exact product lands on an integer (e.g. 200→178 at output row 133),
    so the emulation must accumulate identically."""
    scale = in_size / out_size
    xs = np.empty(out_size, np.int64)
    xo = scale * 0.5
    for i in range(out_size):
        xs[i] = int(xo)
        xo += scale
    return np.clip(xs, 0, in_size - 1).astype(np.int32)


def _pass_u8(img32, idx: np.ndarray, ki: np.ndarray, axis: int):
    """One fixed-point resample pass along `axis` of an int32 array;
    returns int32 values already clipped to [0, 255]."""
    import jax.numpy as jnp
    out_size, ksize = idx.shape
    x = jnp.moveaxis(img32, axis, 0)            # [in_size, ...rest]
    g = jnp.take(x, jnp.asarray(idx.reshape(-1)), axis=0)
    g = g.reshape((out_size, ksize) + x.shape[1:])
    w = jnp.asarray(ki).reshape((out_size, ksize) + (1,) * (x.ndim - 1))
    ss = (g * w).sum(axis=1, dtype=jnp.int32) \
        + jnp.int32(1 << (PRECISION_BITS - 1))
    v = jnp.clip(ss >> PRECISION_BITS, 0, 255)
    return jnp.moveaxis(v, 0, axis)


def resize_u8(img, out_w: int, out_h: int, method: str = "bicubic"):
    """Pillow-exact uint8 convolution resize of [H, W, C] (or [H, W]) to
    [out_h, out_w, ...].  jit-traceable; all indices/weights are static.

    Matches ``Image.fromarray(img).resize((out_w, out_h), BICUBIC)``
    bit-for-bit (horizontal then vertical pass, intermediate clipped to
    8 bits like Pillow's uint8 temp image).
    """
    import jax.numpy as jnp
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    H, W = img.shape[0], img.shape[1]
    x32 = img.astype(jnp.int32)
    if W != out_w:
        x32 = _pass_u8(x32, *coeffs_u8(W, out_w, method), axis=1)
    if H != out_h:
        x32 = _pass_u8(x32, *coeffs_u8(H, out_h, method), axis=0)
    out = x32.astype(jnp.uint8)
    return out[..., 0] if squeeze else out


def resize_nearest_u8(img, out_w: int, out_h: int):
    """Pillow-exact NEAREST resize of [H, W, ...] (pure gather)."""
    import jax.numpy as jnp
    H, W = img.shape[0], img.shape[1]
    out = img
    if W != out_w:
        out = jnp.take(out, jnp.asarray(nearest_indices(W, out_w)), axis=1)
    if H != out_h:
        out = jnp.take(out, jnp.asarray(nearest_indices(H, out_h)), axis=0)
    return out


@dataclasses.dataclass(frozen=True)
class TransformPlan:
    """Static geometry of textural_data.transform_image for one source
    shape: scale_width (incl. the 188→192 hack) then center crop.
    Hashable → usable as a jit static argument."""
    resize_w: int
    resize_h: int
    crop_x: int
    crop_y: int
    out_w: int
    out_h: int


def transform_plan(src_wh: Tuple[int, int], load_size: int,
                   fine_wh: Tuple[int, int]) -> Optional[TransformPlan]:
    """Replicates transform_image's geometry (scale_width → center crop,
    textural/data/base_dataset.py:40-66) for a given source size.

    Returns None when the host path's output would not land exactly on
    `fine_wh` (e.g. sources narrower than the crop — PIL would
    zero-pad); callers must then fall back to the host PIL path.
    """
    ow, oh = src_wh
    if ow == load_size:
        w, h = ow, oh
    else:
        w = load_size
        h = int(load_size * oh / ow)
        if h == 188:                       # the reference's 188→192 hack
            h = 192
    tw, th = fine_wh
    if w < tw or h < th:
        return None
    cx, cy = max(0, w - tw) // 2, max(0, h - th) // 2
    return TransformPlan(w, h, cx, cy, tw, th)


def apply_plan_u8(img, plan: TransformPlan, nearest: bool = False):
    """Device-side transform_image for uint8 maps: Pillow-exact resize
    to (resize_w, resize_h) then the static center crop.  Returns
    uint8 [out_h, out_w, ...]."""
    if nearest:
        out = resize_nearest_u8(img, plan.resize_w, plan.resize_h)
    else:
        out = resize_u8(img, plan.resize_w, plan.resize_h, "bicubic")
    return out[plan.crop_y:plan.crop_y + plan.out_h,
               plan.crop_x:plan.crop_x + plan.out_w]
