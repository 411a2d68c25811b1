"""ctypes bindings for the native host-data library (native/sdn3d_host.cpp).

Auto-builds with `make` on first use if g++ is available; every entry point
has a pure-numpy fallback so the framework runs without the toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libsdn3d_host.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")

    lib.scenegt_decode.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                   u32p, i32p, ctypes.c_int, i32p]
    lib.resize_bilinear_f32.argtypes = [f32p, ctypes.c_int, ctypes.c_int,
                                        ctypes.c_int, f32p, ctypes.c_int,
                                        ctypes.c_int]
    lib.crop_square_resize.argtypes = [f32p, ctypes.c_int, ctypes.c_int,
                                       ctypes.c_int, i32p, ctypes.c_float,
                                       ctypes.c_int, f32p, f32p, f32p]
    lib.nms_cpu.argtypes = [f32p, ctypes.c_int, ctypes.c_float,
                            np.ctypeslib.ndpointer(np.uint8,
                                                   flags="C_CONTIGUOUS")]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def scenegt_decode(img: np.ndarray, keys: np.ndarray,
                   vals: np.ndarray) -> np.ndarray:
    """img [H, W, 3] uint8; keys sorted uint32 (r<<16|g<<8|b); vals int32."""
    lib = _load()
    h, w = img.shape[:2]
    img = np.ascontiguousarray(img, np.uint8)
    keys = np.ascontiguousarray(keys, np.uint32)
    vals = np.ascontiguousarray(vals, np.int32)
    if lib is not None:
        out = np.empty((h, w), np.int32)
        lib.scenegt_decode(img, h, w, keys, vals, len(keys), out)
        return out
    flat = ((img[..., 0].astype(np.uint32) << 16)
            | (img[..., 1].astype(np.uint32) << 8)
            | img[..., 2].astype(np.uint32))
    idx = np.clip(np.searchsorted(keys, flat.ravel()), 0, len(keys) - 1)
    out = np.where(keys[idx] == flat.ravel(), vals[idx], -1)
    return out.reshape(h, w).astype(np.int32)


def crop_square_resize(img: np.ndarray, roi, size: int, fill: float = 0.5,
                       mean=(0.5, 0.5, 0.5), std=(0.25, 0.25, 0.25)
                       ) -> np.ndarray:
    """img [H, W, C] float32 in [0,1]; roi (y1,x1,y2,x2) ints.
    Returns normalized [size, size, C]."""
    lib = _load()
    img = np.ascontiguousarray(img, np.float32)
    h, w, c = img.shape
    roi = np.ascontiguousarray(np.asarray(roi, np.int32))
    mean = np.ascontiguousarray(np.asarray(mean, np.float32))
    std = np.ascontiguousarray(np.asarray(std, np.float32))
    if lib is not None:
        out = np.empty((size, size, c), np.float32)
        lib.crop_square_resize(img, h, w, c, roi, fill, size, mean, std, out)
        return out
    from sdn3d_tpu.data.vkitti import crop_square, resize_bilinear_np
    crop = crop_square(img, roi, fill=fill)
    crop = resize_bilinear_np(crop, size)
    return ((crop - mean) / std).astype(np.float32)


def nms_cpu(boxes: np.ndarray, threshold: float) -> np.ndarray:
    """Score-sorted boxes [N, 4] -> keep mask [N] bool (nms.c parity)."""
    lib = _load()
    boxes = np.ascontiguousarray(boxes, np.float32)
    n = len(boxes)
    if lib is not None:
        keep = np.empty((n,), np.uint8)
        lib.nms_cpu(boxes, n, threshold, keep)
        return keep.astype(bool)
    keep = np.ones(n, bool)
    areas = (boxes[:, 2] - boxes[:, 0] + 1) * (boxes[:, 3] - boxes[:, 1] + 1)
    for i in range(n):
        if not keep[i]:
            continue
        for j in range(i + 1, n):
            if not keep[j]:
                continue
            yy1 = max(boxes[i, 0], boxes[j, 0])
            xx1 = max(boxes[i, 1], boxes[j, 1])
            yy2 = min(boxes[i, 2], boxes[j, 2])
            xx2 = min(boxes[i, 3], boxes[j, 3])
            inter = max(0.0, yy2 - yy1 + 1) * max(0.0, xx2 - xx1 + 1)
            if inter / (areas[i] + areas[j] - inter) > threshold:
                keep[j] = False
    return keep
