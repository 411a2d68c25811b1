"""Mask R-CNN detection wrapper: mold -> network -> unmold.

Re-expression of maskrcnn/model.py:1610-1654 (detect), :2046-2082
(mold_inputs: min/max-dim resize + square pad + mean subtraction) and
:2084-2128 (unmold_detections: box unscaling, per-class mask threshold,
full-frame paste).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np


from sdn3d_tpu.models.maskrcnn import (
    MaskRCNN, MaskRCNNConfig, generate_pyramid_anchors)


def resize_image(image: np.ndarray, min_dim: int, max_dim: int
                 ) -> Tuple[np.ndarray, Tuple[int, int, int, int], float]:
    """maskrcnn/utils.py:272-335: scale so min side >= min_dim and max side
    <= max_dim, then pad to (max_dim, max_dim).  Returns (molded, window,
    scale)."""
    from PIL import Image as PILImage

    h, w = image.shape[:2]
    scale = max(1.0, min_dim / min(h, w))
    if round(max(h, w) * scale) > max_dim:
        scale = max_dim / max(h, w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    img = np.asarray(PILImage.fromarray(image).resize((nw, nh),
                                                      PILImage.BILINEAR))
    top = (max_dim - nh) // 2
    left = (max_dim - nw) // 2
    out = np.zeros((max_dim, max_dim, 3), image.dtype)
    out[top:top + nh, left:left + nw] = img
    window = (top, left, top + nh, left + nw)
    return out, window, scale


@dataclasses.dataclass
class MaskRCNNDetector:
    config: MaskRCNNConfig = MaskRCNNConfig()

    def __post_init__(self):
        import jax

        self.model = MaskRCNN(config=self.config)
        self.anchors = generate_pyramid_anchors(self.config)
        # window is a traced [4] array: it only feeds the clip in
        # refine_detections, and keeping it dynamic means ONE compile
        # serves every input aspect ratio (real KITTI mixes 1242x375 /
        # 1224x370 / 1238x374; a static tuple would recompile the whole
        # graph per aspect).  Unjitted apply dispatches the graph
        # op-by-op through the device relay (~seconds per frame).
        self._apply = jax.jit(self.model.apply,
                              static_argnames=("train",))

        # Serving-path program: uint8 frame in, ONE flat f32 buffer out.
        # The relay charges ~50 ms per device->host fetch and ~70-100
        # MB/s h2d, so (a) the molded frame ships as uint8 (3 MB, not
        # 12 MB f32) with the mean subtraction moved on-device
        # (resize_image keeps uint8, so host f32-subtract and device
        # f32-subtract are byte-identical), and (b) detections /
        # validity / the per-detection OWN-CLASS mask plane come back in
        # one packed fetch (the full [D, mh, mw, C] mask stack is C x
        # larger and the host only ever reads channel class_id).
        def _detect_packed_one(variables, img_u8, anchors, window):
            import jax.numpy as jnp

            mean = jnp.asarray(self.config.mean_pixel, jnp.float32)
            molded = img_u8.astype(jnp.float32) - mean
            out = self.model.apply(variables, molded[None], anchors,
                                   window, train=False)
            dets = out["detections"].astype(jnp.float32)       # [D, 6]
            valid = out["det_valid"].astype(jnp.float32)       # [D]
            masks = out["masks"]                               # [D,mh,mw,C]
            cid = jnp.clip(dets[:, 4].astype(jnp.int32), 0,
                           masks.shape[-1] - 1)
            own = jnp.take_along_axis(
                masks, cid[:, None, None, None], axis=-1)[..., 0]
            return jnp.concatenate([dets.reshape(-1), valid,
                                    own.astype(jnp.float32).reshape(-1)])

        self._detect_packed = jax.jit(_detect_packed_one)

        # Batched variant: the whole fixed-shape inference graph vmapped
        # over an [N] frame axis — ONE dispatch and ONE packed fetch for
        # N frames.  The reference's batch-1 limit (model.py:358) was
        # forced by its CUDA NMS; the rebuild's masked fixed-shape graph
        # has no such constraint (VERDICT r4 item 3).  NOTE: XLA tiles
        # convs differently per batch size, so batched float outputs can
        # differ from the per-frame program by ~1 ulp — callers that pin
        # byte contracts use the per-frame program at N=1 and batch
        # consistently otherwise (pipelines/chain.py:_detect_missing).
        def _detect_packed_n(variables, imgs_u8, anchors, windows):
            import jax

            return jax.vmap(
                lambda im, w: _detect_packed_one(variables, im,
                                                 anchors, w))(
                imgs_u8, windows)

        self._detect_packed_batch = jax.jit(_detect_packed_n)

    def init(self, rng):
        import jax.numpy as jnp

        img = jnp.zeros((1,) + self.config.image_shape)
        return self.model.init(
            rng, img, jnp.asarray(self.anchors),
            jnp.asarray([0.0, 0.0, self.config.image_max_dim,
                         self.config.image_max_dim], jnp.float32),
            train=False)

    def detect_begin(self, variables, image_rgb: np.ndarray):
        """Dispatch the packed detection program for one frame and start
        its d2h fetch streaming; returns an opaque pending handle for
        detect_finish.  Splitting dispatch from unmold lets a chunked
        caller (pipelines/chain.py stage A) queue every frame's program
        before materializing any fetch, so the ~50 ms relay round trip
        and the host unmold ride under the next frames' device compute
        instead of serializing after each one."""
        import jax.numpy as jnp

        cfg = self.config
        molded, window, scale = resize_image(image_rgb, cfg.image_min_dim,
                                             cfg.image_max_dim)
        packed = self._detect_packed(                   # ONE d2h fetch
            variables, jnp.asarray(molded), jnp.asarray(self.anchors),
            jnp.asarray(window, jnp.float32))
        try:
            packed.copy_to_host_async()
        except AttributeError:
            pass
        from sdn3d_tpu.utils import phases
        phases.add_bytes("det.detect", molded, packed)
        return (packed, window, scale, image_rgb.shape[:2])

    def detect_begin_batch(self, variables, images_rgb,
                           pad_to: int | None = None):
        """Dispatch ONE batched detection program for N frames (async
        packed fetch); detect_finish_batch unmolds per frame.

        `pad_to` >= N pads the batch by repeating the last frame so a
        chunked caller compiles ONE program per chunk size regardless of
        how many frames in the chunk actually need detection (cache hits
        vary per chunk; a fresh XLA program per count would both
        recompile and fork the ulp-level batch contract between chunks).
        N == 1 with no padding delegates to the per-frame program —
        byte-identical to detect(), keeping the unbatched serving mode's
        file-contract byte parity."""
        import jax.numpy as jnp

        n = len(images_rgb)
        pad_to = pad_to or n
        assert pad_to >= n
        if pad_to == 1:
            return ("one", self.detect_begin(variables, images_rgb[0]))
        cfg = self.config
        molded_l, metas = [], []
        for img in images_rgb:
            molded, window, scale = resize_image(
                img, cfg.image_min_dim, cfg.image_max_dim)
            molded_l.append(molded)
            metas.append((window, scale, img.shape[:2]))
        molded_l += [molded_l[-1]] * (pad_to - n)
        windows = np.asarray([m[0] for m in metas]
                             + [metas[-1][0]] * (pad_to - n), np.float32)
        packed = self._detect_packed_batch(
            variables, jnp.asarray(np.stack(molded_l)),
            jnp.asarray(self.anchors), jnp.asarray(windows))
        try:
            packed.copy_to_host_async()
        except AttributeError:
            pass
        from sdn3d_tpu.utils import phases
        phases.add_bytes("det.detect", np.stack(molded_l), packed)
        return ("batch", packed, metas)

    def detect_finish_batch(self, pending, mask_threshold: float = 0.5):
        """-> list of (class_ids, masks, rois), one per REAL frame (the
        padding rows are dropped)."""
        if pending[0] == "one":
            return [self.detect_finish(pending[1], mask_threshold)]
        _, packed_dev, metas = pending
        packed = np.asarray(packed_dev)
        return [self._unmold_packed(packed[i], window, scale, hw,
                                    mask_threshold)
                for i, (window, scale, hw) in enumerate(metas)]

    def detect_batch(self, variables, images_rgb,
                     mask_threshold: float = 0.5):
        """N frames -> list of (class_ids, masks, rois) via ONE device
        dispatch (detect_finish_batch(detect_begin_batch(...)))."""
        return self.detect_finish_batch(
            self.detect_begin_batch(variables, images_rgb),
            mask_threshold)

    def detect_finish(self, pending, mask_threshold: float = 0.5
                      ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Materialize detect_begin's packed fetch and unmold it to
        (class_ids [N], masks [N,1,H,W], rois [N,4] original-frame pixel
        coords) — byte-identical to detect()."""
        packed_dev, window, scale, (H, W) = pending
        return self._unmold_packed(np.asarray(packed_dev), window, scale,
                                   (H, W), mask_threshold)

    def _unmold_packed(self, packed: np.ndarray, window, scale, hw,
                       mask_threshold: float = 0.5
                       ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Host unmold of one frame's packed buffer
        (model.py:2084-2128)."""
        from PIL import Image as PILImage

        cfg = self.config
        H, W = hw

        D = cfg.detection_max_instances
        mh, mw = cfg.mask_shape
        dets = packed[:D * 6].reshape(D, 6)           # [D, 6] pixel (molded)
        valid = packed[D * 6:D * 7] > 0.5
        own_masks = packed[D * 7:].reshape(D, mh, mw)  # own-class plane

        class_ids, full_masks, rois = [], [], []
        for i in range(len(dets)):
            if not valid[i]:
                continue
            y1, x1, y2, x2, cid, score = dets[i]
            if not np.isfinite([y1, x1, y2, x2]).all():
                # untrained weights can overflow exp() in the box deltas;
                # the reference guards its detect loop the same way
                # (geometric/scripts/main.py:798-810 bare-except skip)
                continue
            cid = int(cid)
            if cid <= 0 or y2 <= y1 or x2 <= x1:
                continue
            # back to original frame (model.py:2104-2109)
            oy1 = (y1 - window[0]) / scale
            ox1 = (x1 - window[1]) / scale
            oy2 = (y2 - window[0]) / scale
            ox2 = (x2 - window[1]) / scale
            oy1, oy2 = np.clip([oy1, oy2], 0, H)
            ox1, ox2 = np.clip([ox1, ox2], 0, W)
            if oy2 - oy1 < 1 or ox2 - ox1 < 1:
                continue
            m = own_masks[i]
            m = np.asarray(PILImage.fromarray(
                (m * 255).astype(np.uint8)).resize(
                (int(ox2 - ox1), int(oy2 - oy1)), PILImage.BILINEAR))
            m = (m.astype(np.float32) / 255.0 >= mask_threshold)
            full = np.zeros((H, W), np.float32)
            full[int(oy1):int(oy1) + m.shape[0],
                 int(ox1):int(ox1) + m.shape[1]] = m
            class_ids.append(cid)
            full_masks.append(full[None])
            rois.append([oy1, ox1, oy2, ox2])

        if not class_ids:
            return (np.zeros((0,), np.int32),
                    np.zeros((0, 1, H, W), np.float32),
                    np.zeros((0, 4), np.float32))
        return (np.asarray(class_ids, np.int32),
                np.stack(full_masks).astype(np.float32),
                np.asarray(rois, np.float32))

    def detect(self, variables, image_rgb: np.ndarray,
               mask_threshold: float = 0.5
               ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """image_rgb [H, W, 3] uint8 -> (class_ids [N], masks [N,1,H,W],
        rois [N,4] pixel coords in the original frame).  Exactly
        detect_finish(detect_begin(...)) — the split exists for chunked
        overlap; this synchronous form is the reference protocol
        (maskrcnn/model.py:1610-1654)."""
        return self.detect_finish(self.detect_begin(variables, image_rgb),
                                  mask_threshold)
