"""Geometric-branch inference: detections -> de-render -> (optional
silhouette refinement) -> edit ops -> batched re-render -> composite.

Re-expression of geometric/scripts/main.py:_test (:325-622).  Objects are
padded to `max_objects` slots; every per-object Python loop of the
reference becomes a batched device computation.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sdn3d_tpu.data import vkitti as VK
from sdn3d_tpu.models.derenderer import (
    Derenderer, DeviceMeshBank, TargetType, render_blob)
from sdn3d_tpu.ops import pil_resize
from sdn3d_tpu.pipelines import edit as edit_mod
from sdn3d_tpu.render import render, RenderType
from sdn3d_tpu.utils import phases


@dataclasses.dataclass
class DerenderInferConfig:
    image_size: int = 256
    render_size: int = 384
    max_objects: int = 16
    num_opts: int = 0
    opt_lr: float = 3e-2          # main.py:438
    ffd_opt_reg: float = 100.0    # main.py:445
    mode: int = TargetType.extend


def prepare_objects(image_rgb: np.ndarray, rois: np.ndarray,
                    image_masks: np.ndarray, class_ids: np.ndarray,
                    cfg: DerenderInferConfig,
                    all_interested: bool = False,
                    with_masks: bool = True) -> Dict[str, np.ndarray]:
    """Host-side packing of per-object crops to padded slots
    (main.py:344-392).  image_masks [N, 1, H, W]; rois [N, 4] pixel.

    `with_masks=False` skips the per-object render_size mask crops —
    they are consumed only by the silhouette refinement (num_opts > 0),
    and at serving shapes they cost more host time than everything else
    in this function combined."""
    n = len(class_ids)
    M = cfg.max_objects
    assert n <= M, (n, M)

    # Crops are packed as uint8 (VK.transform_rgb_u8): the encoder jit
    # dequantizes + normalizes on device, so the h2d upload is 1 byte per
    # pixel instead of 4 (f32) / 2 (bf16).  This matches the reference's
    # own quantization — its crops come out of a uint8 PIL resize
    # (derender3d/datasets.py:157-173) — and the quantization step
    # (<= 1/510 in [0, 1]) is no coarser than the bf16 cast the trunk
    # applies anyway.
    rgbs = np.zeros((M, cfg.image_size, cfg.image_size, 3), np.uint8)
    masks = np.zeros((M, cfg.render_size, cfg.render_size), np.float32)
    rois_pad = np.zeros((M, 4), np.float32)
    valid = np.zeros((M,), bool)
    # hoist the full-frame uint8 -> [0,1] float conversion out of the
    # per-object loop (identical values; saves ~2 ms x n_objects/frame)
    image_f = np.asarray(image_rgb, np.float32) / 255.0
    image_masks_f = (np.asarray(image_masks, np.float32) if with_masks
                     else None)
    for i in range(n):
        rgbs[i] = VK.transform_rgb_u8(image_f, rois[i], cfg.image_size,
                                      prescaled=True)
        if with_masks:
            masks[i] = VK.transform_mask(image_masks_f[i, 0], rois[i],
                                         cfg.render_size)
        rois_pad[i] = rois[i]
        valid[i] = True

    mask_areas = image_masks[:, 0].sum(axis=(1, 2))
    interests = np.zeros((M,), np.uint8)
    interests[:n] = edit_mod.compute_interests(class_ids, mask_areas,
                                               all_interested)

    roi_norms = VK.roi_norms_from_rois(rois_pad)
    return {
        "rgbs": rgbs,
        "masks": masks[:, None],                  # [M, 1, R, R]
        "roi_norms": roi_norms,
        "focals": np.full((M, 1), VK.Camera.focal, np.float32),
        "valid": valid,
        "interests": interests,
        "class_ids": np.pad(class_ids.astype(np.int32), (0, M - n)),
        "num_objs": n,
    }


# byte -> normalized-f32 lookup table ((x/255 - 0.5)/0.25 computed in
# host f32): indexing it on device gives EXACTLY the host values on any
# backend — inline arithmetic would let XLA turn /255 into a
# reciprocal-multiply (measured 1-ulp diffs on CPU), silently forking
# the crop contract between backends.
_U8_NORM_TABLE = ((np.arange(256, dtype=np.float32) / np.float32(255.0)
                   - np.float32(0.5)) / np.float32(0.25))


@functools.partial(jax.jit, static_argnames=("m",))
def _pad_slots_u8(rgbs: jnp.ndarray, m: int) -> jnp.ndarray:
    """Zero-pad uint8 crops [n, ...] to the padded slot count [m, ...]
    ON DEVICE.  The h2d upload then moves only the n real crops (the
    padded tail of a 16-slot frame with ~5 cars is pure zeros — ~2 MB of
    the 3.15 MB upload at serving shapes), while the encoder still sees
    the exact [m]-slot tensor it always did: same program, same bytes
    (zero uint8 rows == today's zero padding rows).  The pad program
    itself re-traces per n, but it is a trivial memcpy-shaped program."""
    return jnp.pad(rgbs, ((0, m - rgbs.shape[0]),)
                   + ((0, 0),) * (rgbs.ndim - 1))


@functools.lru_cache(maxsize=None)
def _encode_jit(model: Derenderer):
    @jax.jit
    def fn(variables, rgbs, roi_norms, focals):
        if rgbs.dtype == jnp.uint8:
            # dequantize + normalize on device with transform_rgb's exact
            # f32 values (256-entry LUT); the bf16 trunk then applies its
            # own RNE input cast as before
            rgbs = jnp.asarray(_U8_NORM_TABLE)[rgbs.astype(jnp.int32)]
        mroi = jnp.stack([roi_norms[:, 2] + roi_norms[:, 0],
                          roi_norms[:, 3] + roi_norms[:, 1]], axis=1) / 2.0
        droi = jnp.stack([roi_norms[:, 2] - roi_norms[:, 0],
                          roi_norms[:, 3] - roi_norms[:, 1]], axis=1)
        blob = {
            "_roi_norms": roi_norms,
            "_mroi_norms": mroi,
            "_droi_norms": droi,
            "_focals": focals,
        }
        blob.update(model.apply(variables, rgbs, mroi, droi, train=False))
        # one flat byte buffer so the host fetches the whole (~150 KB)
        # blob in a single relay round-trip instead of one per leaf
        packed = jnp.concatenate([
            jax.lax.bitcast_convert_type(
                blob[k].astype(jnp.float32), jnp.uint8).reshape(-1)
            for k in sorted(blob)])
        return blob, packed

    return fn


@functools.lru_cache(maxsize=1)
def _verify_bitcast_order() -> bool:
    """One-time self-check that jax.lax.bitcast_convert_type(f32->uint8)
    emits bytes in the order np.frombuffer(np.float32) expects.  That
    minor-dimension byte order is an XLA implementation detail; on a
    backend where it differs every packed fetch would silently scramble —
    fail loudly instead (runs one tiny jit per process at first unpack)."""
    probe = np.asarray([1.0, -2.5, 3.0e-5, 65504.0], np.float32)
    dev = jax.jit(lambda x: jax.lax.bitcast_convert_type(
        x, jnp.uint8).reshape(-1))(jnp.asarray(probe))
    host = np.frombuffer(np.asarray(dev).tobytes(), np.float32)
    if not np.array_equal(host, probe):
        raise RuntimeError(
            "bitcast_convert_type(f32->uint8) byte order does not match "
            "np.frombuffer on this backend; the packed serving contract "
            f"(_unpack_blob/_unpack_packed) would corrupt data: {host!r}")
    return True


def _unpack_blob(packed_np: np.ndarray, blob) -> Dict[str, np.ndarray]:
    """Host inverse of _encode_jit's packed output (shapes/dtypes from
    the device blob's metadata; no per-leaf transfer)."""
    _verify_bitcast_order()
    out = {}
    buf = packed_np.tobytes()
    off = 0
    for k in sorted(blob):
        shape = tuple(blob[k].shape)
        n = int(np.prod(shape))
        out[k] = np.frombuffer(buf, np.float32, count=n,
                               offset=off).reshape(shape).astype(
            blob[k].dtype)
        off += 4 * n
    return out


_SMALL_KEYS = ("_depths", "_alphas", "_scales", "_rotations",
               "_translations", "_zooms", "_class_samples")


def _smalls_tail(out, width: int, channels: int):
    """Bitcast the per-object small tensors to byte rows of the packed
    buffer's shape ([k, width, channels])."""
    smalls = [jax.lax.bitcast_convert_type(
        out[k].astype(jnp.float32), jnp.uint8).reshape(-1)
        for k in _SMALL_KEYS]
    sv = jnp.concatenate(smalls)
    row = width * channels
    k = -(-int(sv.size) // row)
    return jnp.pad(sv, (0, k * row - int(sv.size))).reshape(
        k, width, channels)


def _pack_frame_device(out, inst, nrm, dep, small=None):
    """Inside-jit packing of one frame's host contract into a single
    uint8 buffer.

    `small=None` (the file contract): [H + k, W, 6] — the first H rows
    carry the quantized 2.5D maps with `save_outputs`' exact math
    (instance uint8; normal RGB uint8; depth uint16 split into lo/hi
    byte planes); the k tail rows carry the per-object small tensors
    (_SMALL_KEYS) bitcast to bytes.  One buffer means ONE device->host
    fetch per frame: the benchmark TPU sits behind a relay measured at
    ~50 ms per fetch round-trip and ~45 MB/s d2h, so the old contract
    (float maps + 9 separate fetches, ~9 MB) cost ~0.7 s/frame in pure
    transfer.

    `small=TransformPlan` (the fused serving contract): [th + k, tw, 4]
    — the instance/normal planes are downsized ON DEVICE to the textural
    stage's conditioning resolution with ops/pil_resize (bit-exact to
    the PIL transform the host would apply, pinned by
    tests/test_pil_resize.py), so the frame fetch shrinks ~6x (2.8 MB →
    0.5 MB at VKITTI size).  The depth plane is dropped: the edit
    conditioning never consumes it (edit_vkitti.py:62-107)."""
    inst_u8 = inst.astype(jnp.uint8)
    # quantize BEFORE the CHW->HWC transpose: same values (elementwise op
    # commutes with transpose), but the layout shuffle moves uint8
    # instead of f32
    nrm_u8 = jnp.transpose(
        jnp.clip(nrm * 255, 0, 255).astype(jnp.uint8), (1, 2, 0))
    if small is not None:
        inst_s = pil_resize.apply_plan_u8(inst_u8, small, nearest=True)
        nrm_s = pil_resize.apply_plan_u8(nrm_u8, small)
        body = jnp.concatenate([inst_s[..., None], nrm_s], axis=-1)
        return jnp.concatenate(
            [body, _smalls_tail(out, small.out_w, 4)], axis=0)
    dep_u16 = (jnp.clip(dep, 0, 1) * 65535).astype(jnp.uint16)
    dep_lo = (dep_u16 & 0xFF).astype(jnp.uint8)[..., None]
    dep_hi = (dep_u16 >> 8).astype(jnp.uint8)[..., None]
    png = jnp.concatenate([inst_u8[..., None], nrm_u8, dep_lo, dep_hi],
                          axis=-1)
    W = inst.shape[1]
    return jnp.concatenate([png, _smalls_tail(out, W, 6)], axis=0)


def _unpack_packed(packed_np: np.ndarray, out, height: int):
    """Host-side inverse of _pack_frame_device: (body [H, W, C] uint8,
    {key: np array in the original dtype/shape}).  Shapes/dtypes come
    from the device arrays' metadata (no transfer).  `height` is the
    body row count (frame H for the full contract, plan.out_h for the
    small serving contract)."""
    _verify_bitcast_order()
    png = packed_np[:height]
    tail = packed_np[height:].tobytes()
    smalls = {}
    off = 0
    for k in _SMALL_KEYS:
        shape = tuple(out[k].shape)
        n = int(np.prod(shape))
        arr = np.frombuffer(tail, np.float32, count=n,
                            offset=off).reshape(shape)
        smalls[k] = arr.astype(out[k].dtype)
        off += n * 4
    return png, smalls


@functools.lru_cache(maxsize=None)
def _render_composite_jit(mode: int, image_size: int, render_size: int,
                          height: int, width: int, small=None):
    @jax.jit
    def fn(blob, bank, interests, obj_valid):
        out = render_blob(blob, bank, mode, image_size, render_size,
                          training=False, obj_valid=obj_valid)
        inst, nrm, dep = edit_mod.composite_objects(
            out["_masks"],
            out.get("_normals",
                    jnp.zeros_like(jnp.repeat(out["_masks"], 3, 1))),
            out.get("_depth_maps", jnp.ones_like(out["_masks"]) * 100.0),
            out["_center2ds"], out["_zooms"], out["_depths"],
            interests, height=height, width=width, render_size=render_size)
        packed = _pack_frame_device(out, inst, nrm, dep, small=small)
        return out, inst, nrm, dep, packed

    return fn


def encode_objects(variables, model: Derenderer, objs: Dict[str, np.ndarray],
                   cfg: DerenderInferConfig
                   ) -> Tuple[Dict[str, jnp.ndarray], jnp.ndarray]:
    """Run the derenderer encoder over all object slots (main.py:385-402).

    jit-cached per model: repeated frames (the 92-pair benchmark loop)
    re-use the compiled program.  Returns (device blob, packed bytes).

    Crops arrive as uint8 (prepare_objects) and are dequantized +
    normalized inside the jit — 1 byte/pixel over the host link instead
    of 4 (16x256x256x3 f32 = 12.6 MB -> 3.1 MB), device math identical
    to the host normalization; pinned by tests/test_derender_infer.py::
    test_encode_uint8_upload_matches_host_normalization.  Float crops
    from legacy callers still work: when the trunk computes in bfloat16
    they are pre-cast on host (the trunk's first conv would apply the
    same RNE cast on device)."""
    rgbs = objs["rgbs"]
    if rgbs.dtype != np.uint8 and model.dtype == jnp.bfloat16:
        rgbs = rgbs.astype(jnp.bfloat16)           # ml_dtypes RNE cast
    n = int(objs.get("num_objs", rgbs.shape[0]))
    M = rgbs.shape[0]
    if isinstance(rgbs, np.ndarray) and rgbs.dtype == np.uint8 and n < M:
        # upload only the real crops; zero-pad to the slot count on
        # device (identical [M]-slot tensor -> identical encoder program
        # and bytes; pinned by test_encode_sliced_upload_matches_full)
        rgbs_dev = (_pad_slots_u8(jnp.asarray(rgbs[:n]), M) if n
                    else jnp.zeros(rgbs.shape, jnp.uint8))
    else:
        rgbs_dev = jnp.asarray(rgbs)
    return _encode_jit(model)(variables, rgbs_dev,
                              jnp.asarray(objs["roi_norms"]),
                              jnp.asarray(objs["focals"]))


def build_default_ignores(image_masks: np.ndarray, log_depths: np.ndarray,
                          droi_norms: np.ndarray) -> np.ndarray:
    """Occlusion ignore maps from predicted depth ordering
    (main.py:405-414): each object ignores pixels covered by any
    nearer-sorted object."""
    depths = log_depths[:, 0] - np.log(droi_norms).sum(axis=1)
    index = np.argsort(depths)
    sorted_masks = np.concatenate(
        [np.zeros_like(image_masks[:1]), image_masks[index]], axis=0)[:-1]
    cum = np.clip(np.cumsum(sorted_masks, axis=0), 0, 1)
    out = np.zeros_like(image_masks)
    out[index] = cum
    return out


_OPT_KEYS = ("_theta_deltas", "_translation2ds", "_log_scales",
             "_ffd_coeffs")


@functools.lru_cache(maxsize=8)
def _refine_jit(image_size: int, render_size: int, num_opts: int,
                opt_lr: float, ffd_opt_reg: float, use_ignores: bool):
    """One jit for the whole refinement loop.  The per-image blob, masks
    and bank are ARGUMENTS (closure-captured arrays would be baked in as
    constants, recompiling per image and stalling the TPU constant
    folder), and the num_opts Adam iterations run as a lax.scan — one
    dispatch instead of num_opts."""
    opt = optax.adam(opt_lr)

    def loss_fn(p, frozen, bank, masks, ignores):
        b = dict(frozen)
        b.update(p)
        # model.train() + _force_no_sample=True during refinement
        # (main.py:424-425): training-mode projection, argmax class.
        out = render_blob(b, bank, TargetType.reproject, image_size,
                          render_size, training=True, force_no_sample=True)
        # NOTE: the reg term is added per-pixel BEFORE the ignore multiply
        # (so its effective weight scales with mean(1 - ignores)) — exactly
        # the reference's ordering (main.py:448-451); keep for parity.
        l = (out["_masks"] - masks) ** 2 + ffd_opt_reg * jnp.mean(
            p["_ffd_coeffs"] ** 2)
        if use_ignores:
            l = l * (1 - ignores)
        return jnp.mean(l)

    def run(params0, frozen, bank, masks, ignores):
        def body(carry, _):
            p, state = carry
            l, g = jax.value_and_grad(loss_fn)(p, frozen, bank, masks,
                                               ignores)
            updates, state = opt.update(g, state)
            return (optax.apply_updates(p, updates), state), l

        (p, _), losses = jax.lax.scan(body, (params0, opt.init(params0)),
                                      None, length=num_opts)
        return p, losses

    return jax.jit(run)


def refine_silhouettes(blob: Dict[str, jnp.ndarray], bank: DeviceMeshBank,
                       masks: jnp.ndarray, ignores: Optional[jnp.ndarray],
                       cfg: DerenderInferConfig) -> Dict[str, jnp.ndarray]:
    """Test-time optimization of pose/shape against detected masks
    (main.py:420-459): Adam(3e-2) over theta/translation2d/log_scale/ffd,
    argmax class, silhouette MSE + 100 * mean(ffd^2), ignore-masked."""
    params0 = {k: blob[k] for k in _OPT_KEYS}
    frozen = {k: jax.lax.stop_gradient(v) for k, v in blob.items()}

    run = _refine_jit(cfg.image_size, cfg.render_size, cfg.num_opts,
                      cfg.opt_lr, cfg.ffd_opt_reg, ignores is not None)
    ign = ignores if ignores is not None else jnp.zeros_like(masks)
    p, _ = run(params0, frozen, bank, masks, ign)

    out = dict(blob)
    out.update({k: jax.lax.stop_gradient(v) for k, v in p.items()})
    return out


def keep_largest_detections(cfg: DerenderInferConfig, class_ids, masks,
                            rois):
    """Keep the <= max_objects largest masks (scripts/main.py:812-818) —
    required before derender_encode, whose padded slots cap at
    cfg.max_objects."""
    if len(class_ids) > cfg.max_objects:
        areas = masks[:, 0].sum((1, 2))
        keep = np.argsort(-areas)[:cfg.max_objects]
        return class_ids[keep], masks[keep], rois[keep]
    return class_ids, masks, rois


def derender_encode(
    variables,
    model: Derenderer,
    bank: DeviceMeshBank,
    image_rgb: np.ndarray,
    class_ids: np.ndarray,
    image_masks: np.ndarray,
    rois: np.ndarray,
    cfg: Optional[DerenderInferConfig] = None,
    image_ignores: Optional[np.ndarray] = None,
    all_interested: bool = False,
) -> Tuple[Dict[str, np.ndarray], Dict[str, object]]:
    """Phase 1 of derender_image: object prep + encoder + optional
    silhouette refinement (main.py:344-459).

    Independent of edit operations, and nothing downstream mutates the
    result — fused-chain callers cache it per source frame and replay
    different edits against it.
    """
    cfg = cfg or DerenderInferConfig()
    with phases.phase("geo.prep"):
        objs = prepare_objects(image_rgb, rois, image_masks, class_ids,
                               cfg, all_interested,
                               with_masks=cfg.num_opts > 0)
        if cfg.num_opts:
            phases.add_bytes("geo.prep", objs["rgbs"], objs["masks"])
        else:
            # only the real crops travel (encode_objects pads on device)
            phases.add_bytes("geo.prep", objs["rgbs"][:objs["num_objs"]])
    with phases.phase("geo.encode"):
        blob, packed = phases.block(
            encode_objects(variables, model, objs, cfg))

    if cfg.num_opts:
        if image_ignores is None:
            image_ignores_full = build_default_ignores(
                image_masks, np.asarray(blob["_log_depths"])[:len(rois)],
                np.asarray(blob["_droi_norms"])[:len(rois)])
        else:
            image_ignores_full = image_ignores
        M = cfg.max_objects
        ign = np.zeros((M, cfg.render_size, cfg.render_size), np.float32)
        for i in range(len(rois)):
            ign[i] = VK.transform_mask(image_ignores_full[i, 0], rois[i],
                                       cfg.render_size)
        with phases.phase("geo.refine"):
            blob = phases.block(refine_silhouettes(
                blob, bank, jnp.asarray(objs["masks"]),
                jnp.asarray(ign[:, None]), cfg))
    # Fetch the (small, ~150 KB total) encoder outputs to host ONCE per
    # source: the edit/replay path does host-side op matching over them
    # per PAIR (pipelines/edit.py), and each np.asarray of a device
    # field costs a ~50 ms relay round-trip — per pair, that was the
    # single biggest geometric phase after the render itself.  The
    # refine path rewrites the blob on device, so it pays the per-leaf
    # device_get; the common num_opts=0 path unpacks the encoder's
    # single packed buffer (one round-trip).
    with phases.phase("geo.encode_fetch"):
        if cfg.num_opts:
            blob = jax.device_get(blob)
        else:
            blob = _unpack_blob(np.asarray(packed), blob)
    return objs, blob


def derender_encode_batch_begin(
    variables,
    model: Derenderer,
    frames: List[Dict[str, object]],
    cfg: DerenderInferConfig,
):
    """Dispatch the encoder for N frames back-to-back and start every
    packed-blob d2h fetch asynchronously.

    Each frame runs the SAME per-frame `_encode_jit` program the
    file-contract CLIs use — a fused [N*M]-slot program would be faster
    to dispatch but its convs tile differently per batch size (measured
    1-ulp output drift on CPU), forking the byte contract.  The relay
    cost the serial path pays per pair — a synchronous upload, dispatch,
    and ~50 ms fetch round-trip — is amortized instead by OVERLAP: all N
    uploads/dispatches enqueue before the first fetch is awaited, so the
    fetches stream while later frames upload and execute.
    num_opts==0 only (silhouette refinement keeps the per-frame path).
    Returns an opaque pending handle for derender_encode_batch_finish."""
    assert cfg.num_opts == 0, \
        "batched encode has no refinement path; use derender_encode"
    pendings = []
    for fr in frames:
        with phases.phase("geo.prep"):
            objs = prepare_objects(
                fr["image_rgb"], fr["rois"], fr["image_masks"],
                fr["class_ids"], cfg, fr.get("all_interested", False),
                with_masks=False)
            phases.add_bytes("geo.prep", objs["rgbs"][:objs["num_objs"]])
        with phases.phase("geo.encode"):
            blob, packed = phases.block(
                encode_objects(variables, model, objs, cfg))
            try:
                packed.copy_to_host_async()
            except AttributeError:
                pass
        pendings.append((objs, blob, packed))
    return pendings


def derender_encode_batch_finish(pendings) -> List[
        Tuple[Dict[str, np.ndarray], Dict[str, object]]]:
    """Materialize a derender_encode_batch_begin handle.  Returns
    [(objs, host blob)] in frame order — each entry interchangeable with
    a derender_encode result (byte-identical: same compiled program)."""
    out = []
    for objs, blob, packed in pendings:
        with phases.phase("geo.encode_fetch"):
            packed_np = np.asarray(packed)
            phases.add_bytes("geo.encode_fetch", packed_np)
            out.append((objs, _unpack_blob(packed_np, blob)))
    return out


def derender_encode_batch(
    variables,
    model: Derenderer,
    frames: List[Dict[str, object]],
    cfg: DerenderInferConfig,
) -> List[Tuple[Dict[str, np.ndarray], Dict[str, object]]]:
    """Multi-frame encode with overlapped fetches (begin + finish)."""
    return derender_encode_batch_finish(
        derender_encode_batch_begin(variables, model, frames, cfg))


def derender_image(
    variables,
    model: Derenderer,
    bank: DeviceMeshBank,
    image_rgb: np.ndarray,
    class_ids: np.ndarray,
    image_masks: np.ndarray,
    rois: np.ndarray,
    cfg: Optional[DerenderInferConfig] = None,
    operations: Optional[List[dict]] = None,
    image_ignores: Optional[np.ndarray] = None,
    all_interested: bool = False,
    metas: Optional[List[dict]] = None,
    encoded: Optional[Tuple[Dict[str, np.ndarray],
                            Dict[str, object]]] = None,
    small_plan=None,
) -> Dict[str, object]:
    """Full single-image geometric inference (main.py:325-622).

    Returns dict with: instance_map [H, W] int32, normal_map [3, H, W],
    depth_map [H, W] in [0,1], json_obj (per-object class/depth/alpha),
    state (3D pkl equivalent), interests.  `encoded` optionally carries a
    cached derender_encode result for this frame.

    `small_plan` (a pil_resize.TransformPlan) switches the host contract
    to the fused serving shape: the quantized instance/normal planes are
    downsized on device to the textural conditioning resolution
    (bit-exact to the host PIL transform) and fetched in place of the
    full-resolution maps — `instance_small`/`normal_small` keys replace
    `instance_png`/`normal_png`/`depth_png`.
    """
    cfg = cfg or DerenderInferConfig()
    H, W = image_rgb.shape[:2]

    if encoded is None:
        encoded = derender_encode(variables, model, bank, image_rgb,
                                  class_ids, image_masks, rois, cfg,
                                  image_ignores, all_interested)
    objs, blob = encoded
    with phases.phase("geo.edit"):
        blob_t, interests = _edited_blob(objs, blob, operations)
    with phases.phase("geo.render"):
        out, inst, nrm, dep, packed = phases.block(_render_composite_jit(
            cfg.mode, cfg.image_size, cfg.render_size, H, W,
            small=small_plan)(
            blob_t, bank, jnp.asarray(interests),
            jnp.asarray(objs["valid"])))
        try:
            packed.copy_to_host_async()    # stream the fetch early
        except AttributeError:
            pass

    with phases.phase("geo.package"):
        packed_np = np.asarray(packed)      # the ONE d2h fetch per frame
        phases.add_bytes("geo.package", packed_np)
        return _package_frame(objs, rois, interests, out, inst, nrm, dep,
                              packed_np, metas=metas,
                              small_plan=small_plan)


def _edited_blob(objs, blob, operations: Optional[List[dict]]
                 ) -> Tuple[Dict[str, jnp.ndarray], np.ndarray]:
    """Apply edit operations to an encoded blob (host-side op matching +
    pose rewrites, main.py:461-514) and return the jit-ready tensor blob
    plus the per-slot interests after deletes."""
    interests = objs["interests"].copy()
    interests = interests * objs["valid"]
    if operations:
        n = objs["num_objs"]
        pairs = edit_mod.match_operations(
            np.asarray(blob["_mroi_norms"])[:n], operations)
        blob, interests_n = edit_mod.apply_operations(
            blob, interests[:n], operations, pairs)
        interests = np.concatenate(
            [interests_n, interests[n:]]).astype(np.uint8)

    # blob may carry non-tensor entries; keep only device arrays for jit.
    blob_t = {k: v for k, v in blob.items()
              if isinstance(v, (jnp.ndarray, np.ndarray))}
    return blob_t, interests


_STATE_KEYS = ("_scales", "_rotations", "_translations", "_zooms",
               "_class_samples")


def _package_frame(objs, rois, interests, out, inst, nrm, dep, packed_np,
                   metas: Optional[List[dict]] = None,
                   small_plan=None) -> Dict[str, object]:
    """Host-side packaging of one frame's render outputs into the
    derender_image contract (instance/normal/depth maps + per-object JSON
    + 3D state pkl equivalent, main.py:530-622).  Shared by the
    single-frame and batched paths — the file contract must stay
    byte-identical between them.

    `packed_np` is the fetched _pack_frame_device buffer; everything the
    host needs comes out of it.  The float-precision maps stay as DEVICE
    arrays under the legacy `instance_map`/`normal_map`/`depth_map` keys:
    numpy consumers (tests) still work via __array__, but the multi-MB
    device->host transfer now only happens if someone actually reads
    them — the serving path reads the quantized `*_png` views instead.

    With `small_plan` the buffer carries the device-downsized serving
    planes: `instance_small` [th, tw] / `normal_small` [th, tw, 3]
    replace the full-resolution `*_png` keys."""
    height = (int(inst.shape[0]) if small_plan is None
              else small_plan.out_h)
    png, smalls = _unpack_packed(packed_np, out, height)

    json_obj = {}
    depths_np = smalls["_depths"].astype(np.float32)
    alphas_np = smalls["_alphas"].astype(np.float32)
    for i in range(objs["num_objs"]):
        if interests[i]:
            entry = {
                "class_id": int(objs["class_ids"][i]),
                "depth": float(depths_np[i, 0]),
                "alpha": float(alphas_np[i, 0]),
            }
            if metas is not None:
                entry.update(metas[i])
            json_obj[i + 1] = entry

    state = {"num_objs": objs["num_objs"], "rois": rois,
             "interests": interests}
    state.update({k: smalls[k] for k in _STATE_KEYS})

    result = {
        # legacy full-precision views (lazy device arrays):
        "instance_map": inst,
        "normal_map": nrm,
        "depth_map": dep,
        "json_obj": json_obj,
        "state": state,
        "interests": interests,
    }
    if small_plan is None:
        # quantized host views (the serving + file contract):
        result["instance_png"] = np.ascontiguousarray(png[..., 0])
        result["normal_png"] = np.ascontiguousarray(png[..., 1:4])
        result["depth_png"] = (png[..., 4].astype(np.uint16)
                               | (png[..., 5].astype(np.uint16) << 8))
        result["instance_map"] = png[..., 0].astype(np.int32)
    else:
        result["instance_small"] = np.ascontiguousarray(png[..., 0])
        result["normal_small"] = np.ascontiguousarray(png[..., 1:4])
    return result


@functools.lru_cache(maxsize=None)
def _render_composite_batch_jit(mode: int, image_size: int,
                                render_size: int, height: int, width: int,
                                n_frames: int, small=None):
    """Multi-frame variant of _render_composite_jit: N frames' padded
    object slots flatten into ONE [N*M]-object render program (objects
    are independent through render_blob — same raster kernel, bigger
    batch), and only the full-frame composites vmap over the frame axis.
    This is the TPU-native serving shape: per-call dispatch and kernel
    launch overheads amortize over the batch, and the leading frame axis
    is the natural data-parallel sharding axis on a device mesh."""
    @jax.jit
    def fn(blob, bank, interests, obj_valid):
        flat = jax.tree_util.tree_map(
            lambda x: x.reshape((-1,) + x.shape[2:]), blob)
        out = render_blob(flat, bank, mode, image_size, render_size,
                          training=False, obj_valid=obj_valid.reshape(-1))
        out = jax.tree_util.tree_map(
            lambda x: x.reshape((n_frames, -1) + x.shape[1:]), out)

        def comp(o, i):
            inst, nrm, dep = edit_mod.composite_objects(
                o["_masks"],
                o.get("_normals",
                      jnp.zeros_like(jnp.repeat(o["_masks"], 3, 1))),
                o.get("_depth_maps", jnp.ones_like(o["_masks"]) * 100.0),
                o["_center2ds"], o["_zooms"], o["_depths"], i,
                height=height, width=width, render_size=render_size)
            return inst, nrm, dep, _pack_frame_device(o, inst, nrm, dep,
                                                      small=small)

        inst, nrm, dep, packed = jax.vmap(comp)(out, interests)
        return out, inst, nrm, dep, packed

    return fn


def derender_images_batch(
    variables,
    model: Derenderer,
    bank: DeviceMeshBank,
    frames: List[Dict[str, object]],
    cfg: Optional[DerenderInferConfig] = None,
    sharding=None,
    small_plan=None,
) -> List[Dict[str, object]]:
    """Batched multi-frame geometric inference.

    Each frames[i] is a dict with keys `image_rgb`, `class_ids`,
    `image_masks`, `rois` and optional `operations` / `metas` /
    `encoded` / `image_ignores` / `all_interested` — the same arguments
    derender_image takes.  All frames must share the full-frame size.
    Returns one derender_image-contract dict per frame (identical values
    to calling derender_image per frame: the render program only gains a
    batch dimension and the composite is vmapped).

    `sharding` optionally shards the frame axis over a data mesh
    (parallel.batch_sharding): each device renders its frames' objects
    and composites locally — the multi-chip serving mode (len(frames)
    must divide the mesh; parity pinned by
    tests/test_derender_infer.py::test_derender_images_batch_sharded).
    """
    return derender_render_finish(derender_render_begin(
        variables, model, bank, frames, cfg, sharding=sharding,
        small_plan=small_plan))


def derender_render_begin(
    variables,
    model: Derenderer,
    bank: DeviceMeshBank,
    frames: List[Dict[str, object]],
    cfg: Optional[DerenderInferConfig] = None,
    sharding=None,
    small_plan=None,
):
    """First half of derender_images_batch: host edit + upload + ONE
    batched render dispatch, with the packed-contract d2h fetch started
    asynchronously.  Returns an opaque pending handle for
    derender_render_finish — the pipelined chain runs the next chunk's
    host work while this chunk's render executes and its packed buffer
    streams back."""
    cfg = cfg or DerenderInferConfig()
    H, W = frames[0]["image_rgb"].shape[:2]

    per = []
    for fr in frames:
        assert fr["image_rgb"].shape[:2] == (H, W), \
            "batched frames must share the full-frame size"
        encoded = fr.get("encoded")
        if encoded is None:
            encoded = derender_encode(
                variables, model, bank, fr["image_rgb"], fr["class_ids"],
                fr["image_masks"], fr["rois"], cfg,
                fr.get("image_ignores"), fr.get("all_interested", False))
        objs, blob = encoded
        with phases.phase("geo.edit"):
            blob_t, interests = _edited_blob(objs, blob,
                                             fr.get("operations"))
        per.append((objs, blob_t, interests))

    with phases.phase("geo.upload"):
        keys = sorted(per[0][1].keys())
        stacked = {k: jnp.stack([jnp.asarray(p[1][k]) for p in per])
                   for k in keys}
        interests_b = jnp.asarray(np.stack([p[2] for p in per]))
        valid_b = jnp.asarray(np.stack([p[0]["valid"] for p in per]))
        if sharding is not None:
            stacked = {k: jax.device_put(v, sharding)
                       for k, v in stacked.items()}
            interests_b = jax.device_put(interests_b, sharding)
            valid_b = jax.device_put(valid_b, sharding)
        phases.block((stacked, interests_b, valid_b))

    with phases.phase("geo.render"):
        outN, instN, nrmN, depN, packedN = phases.block(
            _render_composite_batch_jit(
                cfg.mode, cfg.image_size, cfg.render_size, H, W,
                len(frames), small=small_plan)(
                stacked, bank, interests_b, valid_b))
        try:
            packedN.copy_to_host_async()
        except AttributeError:
            pass
    return per, frames, outN, instN, nrmN, depN, packedN, small_plan


def derender_render_finish(pending) -> List[Dict[str, object]]:
    """Second half of derender_images_batch: materialize the (already
    streaming) packed fetch and build each frame's host contract."""
    per, frames, outN, instN, nrmN, depN, packedN, small_plan = pending
    with phases.phase("geo.package"):
        packed_np = np.asarray(packedN)     # ONE d2h fetch for the chunk
        phases.add_bytes("geo.package", packed_np)
        results = []
        for i, (objs, _bt, interests) in enumerate(per):
            out_i = {k: v[i] for k, v in outN.items()}
            results.append(_package_frame(
                objs, frames[i]["rois"], interests, out_i,
                instN[i], nrmN[i], depN[i], packed_np[i],
                metas=frames[i].get("metas"), small_plan=small_plan))
    return results
