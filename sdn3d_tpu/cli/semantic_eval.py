"""Semantic branch evaluation CLI (mirrors semantic/vkitti_eval.py):
multi-scale inference over the VKITTI test split, reporting per-class IoU,
mean IoU and pixel accuracy (vkitti_eval.py:50-107)."""

from __future__ import annotations

import argparse
import os

import numpy as np


def build_argparser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_root", default=os.environ.get("VKITTI_ROOT_DIR"),
                   required=False)
    p.add_argument("--ckpt_dir", default=None)
    p.add_argument("--num_class", type=int, default=14)
    p.add_argument("--scales", type=int, nargs="+",
                   default=[100, 150, 200, 300, 375])
    p.add_argument("--limit", type=int, default=0,
                   help="evaluate at most N frames (0 = all)")
    return p


def main(argv=None):
    from PIL import Image

    from sdn3d_tpu.cli.semantic_test import load_model
    from sdn3d_tpu.data.vkitti import decode_scenegt, get_lists, get_tables
    from sdn3d_tpu.pipelines.semantic import (
        accuracy, intersection_and_union, multiscale_labels)
    from sdn3d_tpu.utils.profiling import AverageMeter

    args = build_argparser().parse_args(argv)
    assert args.data_root, "VKITTI_ROOT_DIR or --data_root required"
    model, variables = load_model(args)

    table = get_tables("segm", args.data_root)
    files = get_lists("test")
    if args.limit:
        files = files[:args.limit]

    acc_meter = AverageMeter()
    inter_sum = np.zeros(args.num_class)
    union_sum = np.zeros(args.num_class)

    for i, f in enumerate(files):
        world, scene, _ = f.split("/")
        rgb = np.asarray(Image.open(os.path.join(
            args.data_root, "vkitti_1.3.1_rgb", f)).convert("RGB"))
        gt = decode_scenegt(np.asarray(Image.open(os.path.join(
            args.data_root, "vkitti_1.3.1_scenegt", f)).convert("RGB")),
            world, scene, table)

        from sdn3d_tpu.data.semantic_data import MEAN_BGR, STD_BGR
        img = rgb.astype(np.float32)[:, :, ::-1]
        img = (img - np.asarray(MEAN_BGR, np.float32)) / np.asarray(
            STD_BGR, np.float32)
        pred = multiscale_labels(variables, model, img,
                                 scales=tuple(args.scales))
        acc, pix = accuracy(pred, gt)
        inter, union = intersection_and_union(pred, gt, args.num_class)
        acc_meter.update(acc, pix)
        inter_sum += inter
        union_sum += union
        print(f"[{i + 1}/{len(files)}] {f}: acc={acc:.4f}", flush=True)

    iou = inter_sum / (union_sum + 1e-10)
    for c, v in enumerate(iou):
        print(f"class [{c}], IoU: {v:.4f}")
    print(f"[Eval Summary]:\nMean IoU: {iou.mean():.4f}, "
          f"Accuracy: {acc_meter.average * 100:.2f}%")


if __name__ == "__main__":
    main()
