"""Geometric branch CLI (mirrors geometric/scripts/main.py).

--do test --mode extend --source maskrcnn|gt --edit_json ... : per-image
de-render + edit + re-render, writing {name}.png (instance map),
{name}.json, {name}-normal.png, {name}-depth.png, {name}.pkl — the
inter-branch filesystem contract (scripts/main.py:530-622).
"""

from __future__ import annotations

import argparse
import json
import os
import pickle

import numpy as np


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--do", choices=["test"], default="test")
    p.add_argument("--mode", choices=["pretrain", "full", "finetune",
                                      "extend"], default="extend")
    p.add_argument("--source", choices=["gt", "maskrcnn"], default="maskrcnn")
    p.add_argument("--num_opts", type=int, default=0)
    p.add_argument("--image_size", type=int, default=256)
    p.add_argument("--render_size", type=int, default=384)
    p.add_argument("--ckpt_dir", default=None)
    p.add_argument("--maskrcnn_ckpt", default=None)
    p.add_argument("--compute_dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="conv compute dtype for Mask R-CNN + derenderer")
    p.add_argument("--shapenet_root",
                   default=os.environ.get("SHAPENET_ROOT_DIR"))
    p.add_argument("--edit_json", default=None)
    p.add_argument("--input_image", default=None,
                   help="single-image mode: path to the RGB frame")
    p.add_argument("--input_masks", default=None,
                   help="npz with rois [N,4], masks [N,1,H,W], class_ids [N]"
                        " (gt source)")
    p.add_argument("--vkitti_root",
                   default=os.environ.get("VKITTI_ROOT_DIR"),
                   help="dataset mode: iterate VKITTI frames (edit_json "
                        "sources, or the whole --split)")
    p.add_argument("--split", choices=["train", "test", "all"],
                   default="test")
    p.add_argument("--output_dir", default="./geometric_out")
    return p


def load_derenderer(args):
    import jax
    import jax.numpy as jnp

    from sdn3d_tpu.core.checkpoint import restore_variables
    from sdn3d_tpu.geometry.assets import load_shapenet_bank
    from sdn3d_tpu.models.derenderer import Derenderer, DeviceMeshBank

    model = Derenderer(num_classes=8, dtype=jnp.dtype(
        getattr(args, "compute_dtype", "float32")))
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, args.image_size,
                                          args.image_size, 3)),
        jnp.zeros((1, 2)), jnp.zeros((1, 2)), train=False)
    if args.ckpt_dir:
        # accepts bare variables or cli/geometric_train's full TrainState
        variables, step = restore_variables(args.ckpt_dir, variables)
        print(f"restored derenderer checkpoint step {step}")
    else:
        print("WARNING: no --ckpt_dir; random derenderer weights")
    bank = DeviceMeshBank.from_host(load_shapenet_bank(args.shapenet_root))
    return model, variables, bank


def make_detector(args):
    """Build + (optionally) restore the Mask R-CNN detector ONCE — the
    jit program and weights are reused across every frame of the run."""
    import jax

    from sdn3d_tpu.core.checkpoint import restore_variables
    from sdn3d_tpu.models.maskrcnn import MaskRCNNConfig
    from sdn3d_tpu.pipelines.detect import MaskRCNNDetector

    det = MaskRCNNDetector(MaskRCNNConfig(
        compute_dtype=getattr(args, "compute_dtype", "float32")))
    variables = det.init(jax.random.PRNGKey(0))
    if args.maskrcnn_ckpt:
        # accepts cli/detect_train's train-state dicts or bare variables
        variables, _ = restore_variables(args.maskrcnn_ckpt, variables)
    else:
        print("WARNING: no --maskrcnn_ckpt; random detector weights")
    return det, variables


def detect_objects(args, image_rgb: np.ndarray, detector=None):
    """Object proposals: from a GT npz or from Mask R-CNN.  `detector`
    is a (MaskRCNNDetector, variables) pair from make_detector; when
    None a throwaway one is built (single-shot callers)."""
    if args.source == "gt" or args.input_masks:
        data = np.load(args.input_masks)
        return data["class_ids"], data["masks"], data["rois"]
    if detector is None:
        detector = make_detector(args)
    det, variables = detector
    return det.detect(variables, image_rgb)


def quantize_instance_map(inst: np.ndarray) -> np.ndarray:
    """[H, W] object indices -> the uint8 written to `{name}.png`."""
    return inst.astype(np.uint8)


def quantize_normal_map(nrm: np.ndarray) -> np.ndarray:
    """[3, H, W] float normals -> the uint8 RGB written to
    `{name}-normal.png`.  The ONE copy of the file contract's
    quantization: the fused chain (pipelines/chain.py) feeds these same
    bytes to the textural stage in memory, which is what makes fused ==
    file-based byte-identical."""
    return np.clip(nrm.transpose(1, 2, 0) * 255, 0, 255).astype(np.uint8)


def save_outputs(out: dict, output_dir: str, name: str) -> None:
    """The inter-branch filesystem contract (scripts/main.py:530-622).

    derender_image quantizes ON DEVICE with this exact math and ships the
    bytes in one packed fetch (`*_png` keys); fall back to host-side
    quantization for producers that only carry the float maps."""
    from PIL import Image

    os.makedirs(output_dir, exist_ok=True)
    inst_png = out.get("instance_png")
    if inst_png is None:
        inst_png = quantize_instance_map(np.asarray(out["instance_map"]))
    nrm_png = out.get("normal_png")
    if nrm_png is None:
        nrm_png = quantize_normal_map(np.asarray(out["normal_map"]))
    dep_png = out.get("depth_png")
    if dep_png is None:
        dep_png = (np.clip(np.asarray(out["depth_map"]), 0, 1)
                   * 65535).astype(np.uint16)
    Image.fromarray(inst_png).save(
        os.path.join(output_dir, f"{name}.png"))
    Image.fromarray(nrm_png).save(
        os.path.join(output_dir, f"{name}-normal.png"))
    Image.fromarray(dep_png).save(      # uint16 -> I;16 (PIL infers)
        os.path.join(output_dir, f"{name}-depth.png"))
    with open(os.path.join(output_dir, f"{name}.json"), "w") as f:
        json.dump(out["json_obj"], f, indent=4)
    with open(os.path.join(output_dir, f"{name}.pkl"), "wb") as f:
        pickle.dump(out["state"], f)


def _keep_largest(cfg, class_ids, masks, rois):
    """keep <=16 largest masks (scripts/main.py:812-818)."""
    from sdn3d_tpu.pipelines.derender_infer import keep_largest_detections
    return keep_largest_detections(cfg, class_ids, masks, rois)


def _iter_work(args):
    """Yield (name, src_key, image_rgb, gt_or_None, operations) items.
    `src_key` identifies the SOURCE frame — the detection cache key, so
    items sharing a source reuse its detections (id(image) is unsafe:
    a freed ndarray's address can be reused by a later frame).

    Three modes, mirroring scripts/main.py test():
      * --input_image: one frame (optionally repeated per edit item);
      * --vkitti_root + --edit_json: each edit item's own source frame;
      * --vkitti_root alone: the whole --split.
    """
    from PIL import Image

    if args.input_image:
        image = np.asarray(Image.open(args.input_image).convert("RGB"))
        if args.edit_json:
            from sdn3d_tpu.data.vkitti import load_edit_json
            for i, item in enumerate(load_edit_json(args.edit_json)):
                yield f"{i:05d}", args.input_image, image, None, \
                    item.operations
        else:
            name = os.path.splitext(os.path.basename(args.input_image))[0]
            yield name, args.input_image, image, None, None
        return

    assert args.vkitti_root, \
        "provide --input_image or --vkitti_root (dataset mode)"
    from sdn3d_tpu.data import vkitti as VK

    table_inst = (VK.get_tables("inst", args.vkitti_root)
                  if args.source == "gt" else None)

    def gt_for(world, topic, frame):
        if table_inst is None:
            return None
        return VK.gt_objects(args.vkitti_root, world, topic, frame,
                             table_inst)

    if args.edit_json:
        from sdn3d_tpu.data.vkitti import load_edit_json
        for item in load_edit_json(args.edit_json):
            frame = int(item.source)
            image = np.asarray(Image.open(VK.rgb_path(
                args.vkitti_root, item.world, item.topic,
                frame)).convert("RGB"))
            yield (item.target_name, item.source_name, image,
                   gt_for(item.world, item.topic, frame), item.operations)
    else:
        from sdn3d_tpu.data.vkitti_derender import VKittiMotgt
        motgt = VKittiMotgt(args.vkitti_root)
        for world, topic, frame in motgt.frames(args.split):
            name = f"{world}_{topic}_{frame:05d}"
            image = np.asarray(Image.open(VK.rgb_path(
                args.vkitti_root, world, topic, frame)).convert("RGB"))
            yield (name, name, image, gt_for(world, topic, frame), None)


def main(argv=None):
    from sdn3d_tpu.models.derenderer import TargetType
    from sdn3d_tpu.pipelines.derender_infer import (
        DerenderInferConfig, derender_image)
    from sdn3d_tpu.utils.locks import crash_guard, try_claim

    parser = build_argparser()
    args = parser.parse_args(argv)
    if args.source == "gt" and args.input_image and not args.input_masks:
        parser.error("--source gt with --input_image requires "
                     "--input_masks (npz with rois/masks/class_ids)")
    model, variables, bank = load_derenderer(args)
    cfg = DerenderInferConfig(
        image_size=args.image_size, render_size=args.render_size,
        num_opts=args.num_opts, mode=TargetType.BY_NAME[args.mode])

    detector = None      # built lazily, ONCE, for maskrcnn source
    cached = {}
    for name, src_key, image, gt, ops in _iter_work(args):
        # lock-file skip/claim for concurrent or resumed runs
        # (scripts/main.py:707-716)
        if not try_claim(args.output_dir, name):
            print(f"skip {name} (locked)")
            continue
        with crash_guard(name):
            if src_key not in cached:
                if gt is not None:
                    dets = gt
                else:
                    if detector is None and not (
                            args.source == "gt" or args.input_masks):
                        detector = make_detector(args)
                    dets = detect_objects(args, image, detector)
                # keep the last source only (masks are large; the
                # benchmark JSON groups items by source frame)
                cached = {src_key: _keep_largest(cfg, *dets)}
            class_ids, masks, rois = cached[src_key]
            out = derender_image(variables, model, bank, image, class_ids,
                                 masks, rois, cfg, operations=ops)
            save_outputs(out, args.output_dir, name)
            print(f"wrote {name} ({len(ops or [])} ops)")


if __name__ == "__main__":
    main()
