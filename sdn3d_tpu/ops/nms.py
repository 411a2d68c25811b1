"""Fixed-shape non-maximum suppression.

TPU-native equivalent of the Faster-R-CNN CUDA NMS
(geometric/maskrcnn/nms/src/cuda/nms_kernel.cu): the 64-box bitmask blocks
become a dense IoU matrix + a sequential greedy pass under lax.fori_loop —
deterministic, static shapes, no host round trip.

Semantics match `devIoU`: pixel-inclusive areas (x2 - x1 + 1).  Boxes must
already be sorted by descending score (the callers sort first:
maskrcnn/model.py:361-366, 788-795).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def iou_matrix(boxes: jnp.ndarray, plus_one: bool = True) -> jnp.ndarray:
    """Pairwise IoU [N, N]; boxes [N, 4] as (y1, x1, y2, x2) or any
    consistent (lo0, lo1, hi0, hi1) layout."""
    off = 1.0 if plus_one else 0.0
    lo = boxes[:, :2]
    hi = boxes[:, 2:]
    area = jnp.prod(hi - lo + off, axis=1)
    inter_lo = jnp.maximum(lo[:, None, :], lo[None, :, :])
    inter_hi = jnp.minimum(hi[:, None, :], hi[None, :, :])
    inter = jnp.prod(jnp.maximum(inter_hi - inter_lo + off, 0.0), axis=-1)
    return inter / (area[:, None] + area[None, :] - inter)


def nms(boxes: jnp.ndarray, threshold: float,
        valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Greedy NMS over score-sorted boxes [N, 4] -> keep mask [N] bool.

    Matches nms_kernel.cu: box i is kept iff no earlier *kept* box overlaps
    it with IoU > threshold.
    """
    N = boxes.shape[0]
    iou = iou_matrix(boxes.astype(jnp.float32))
    over = iou > threshold
    if valid is not None:
        over = over & valid[:, None] & valid[None, :]

    def body(i, keep):
        # box i survives iff no kept j < i suppresses it
        idx = jnp.arange(N)
        suppressed = jnp.any(keep & (idx < i) & over[:, i])
        this_valid = True if valid is None else valid[i]
        return keep.at[i].set(jnp.logical_and(~suppressed, this_valid))

    keep0 = jnp.zeros((N,), bool)
    return jax.lax.fori_loop(0, N, body, keep0)


def nms_padded(boxes: jnp.ndarray, scores: jnp.ndarray, threshold: float,
               max_out: int, valid: jnp.ndarray | None = None
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sort by score, suppress, return (indices [max_out], valid [max_out]).

    Fixed-size output: surviving box indices into the input order, padded
    with 0s; `valid` marks real entries.
    """
    order = jnp.argsort(-scores)
    sorted_boxes = boxes[order]
    sorted_valid = None if valid is None else valid[order]
    keep = nms(sorted_boxes, threshold, sorted_valid)

    # Stable-compact the kept indices to the front.
    rank = jnp.cumsum(keep) - 1
    slot = jnp.where(keep, rank, max_out)
    out = jnp.full((max_out + 1,), 0, order.dtype)
    out = out.at[jnp.minimum(slot, max_out)].set(order)
    n_keep = jnp.sum(keep)
    out_valid = jnp.arange(max_out) < jnp.minimum(n_keep, max_out)
    return out[:max_out], out_valid
