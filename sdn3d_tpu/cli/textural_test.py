"""Textural branch reconstruction test CLI (mirrors textural/test.py):
regenerate each test-split frame from its own conditioning and print the
average L1 against the real image ('avg:' — test.py:67,75-77)."""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def build_argparser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_root", default=os.environ.get("VKITTI_ROOT_DIR"))
    p.add_argument("--segm_dir", required=True)
    p.add_argument("--geo_dir", required=True,
                   help="geometric outputs named {world}_{topic}_{frame}.*")
    p.add_argument("--ckpt_dir", default=None)
    p.add_argument("--results_dir", default="./textural_test_out")
    p.add_argument("--load_size", type=int, default=624)
    p.add_argument("--fine_width", type=int, default=624)
    p.add_argument("--fine_height", type=int, default=192)
    p.add_argument("--limit", type=int, default=0)
    return p


def main(argv=None):
    from PIL import Image
    import jax.numpy as jnp

    from sdn3d_tpu.cli.edit_vkitti import load_trainer
    from sdn3d_tpu.data.textural_data import (
        assemble_condition_maps, dense_instance_slots, transform_image)
    from sdn3d_tpu.data.vkitti import get_lists
    from sdn3d_tpu.utils.visualizer import HTMLGallery, tensor2im

    args = build_argparser().parse_args(argv)
    args.no_vgg = True
    trainer, state = load_trainer(args)
    wh = (args.fine_width, args.fine_height)

    files = get_lists("test")
    if args.limit:
        files = files[:args.limit]

    gallery = HTMLGallery(args.results_dir, "reconstruction test")
    l1s = []
    for f in files:
        world, scene, frame_png = f.split("/")
        name = f"{world}_{scene}_{os.path.splitext(frame_png)[0]}"
        segm_path = os.path.join(args.segm_dir, f"{name}.png")
        inst_path = os.path.join(args.geo_dir, f"{name}.png")
        json_path = os.path.join(args.geo_dir, f"{name}.json")
        if not (os.path.exists(segm_path) and os.path.exists(inst_path)):
            continue
        image = transform_image(Image.open(os.path.join(
            args.data_root, "vkitti_1.3.1_rgb", f)).convert("RGB"),
            args.load_size, wh)
        segm = (np.asarray(transform_image(
            Image.open(segm_path), args.load_size, wh, nearest=True,
            normalize=False)) * 255.0).astype(np.int32)[..., 0]
        inst = (np.asarray(transform_image(
            Image.open(inst_path), args.load_size, wh, nearest=True,
            normalize=False)) * 255.0).astype(np.int32)[..., 0]
        with open(json_path) as fh:
            json_obj = json.load(fh)
        normal_path = os.path.join(args.geo_dir, f"{name}-normal.png")
        normal = None
        if os.path.exists(normal_path):
            normal = np.asarray(transform_image(
                Image.open(normal_path).convert("RGB"), args.load_size, wh,
                normalize=False)) * 255.0
        maps = assemble_condition_maps(segm, inst, json_obj, normal)
        if "normal" not in maps:
            maps["normal"] = np.zeros(image.shape, np.float32)
        slots, _ = dense_instance_slots(maps["inst"],
                                        trainer.cfg.max_instances)
        batch = {
            "label": jnp.asarray(maps["label"][None]),
            "inst": jnp.asarray(maps["inst"][None]),
            "inst_slots": jnp.asarray(slots[None]),
            "image": jnp.asarray(image[None]),
            "pose": jnp.asarray(maps["pose"][None]),
            "normal": jnp.asarray(maps["normal"][None].astype(np.float32)),
        }
        fake = np.asarray(trainer.fake_inference_jit(state, batch)[0])
        l1 = float(np.abs(fake - image).mean())
        l1s.append(l1)
        gallery.add_images({"synthesized": tensor2im(fake),
                            "real": tensor2im(image)}, name)
        print(f"{name}: L1={l1:.4f} avg: {np.mean(l1s):.4f}", flush=True)

    print(f"avg: {np.mean(l1s):.4f} over {len(l1s)} frames")
    gallery.save()


if __name__ == "__main__":
    main()
