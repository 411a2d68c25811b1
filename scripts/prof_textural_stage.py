"""Per-phase timing of the edit_benchmark textural loop over the existing
dryrun fixture (run scripts/benchmark_dryrun.py first).

Phases per pair: host PNG load/transform | generate_edit_frame
(encode + host feat splat + fake_inference) | L1+LPIPS | gallery write.

Usage: python scripts/prof_textural_stage.py [n_pairs] [work_dir]
"""
import argparse
import os
import sys
import time

import numpy as np
from PIL import Image

from sdn3d_tpu.cli.edit_vkitti import load_trainer, generate_edit_frame
from sdn3d_tpu.data.vkitti import load_edit_json, benchmark_split
from sdn3d_tpu.data.textural_data import transform_image
from sdn3d_tpu.utils import metrics
from sdn3d_tpu.utils.visualizer import tensor2im

N = int(sys.argv[1]) if len(sys.argv) > 1 else 8
WORK = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sdn3d_benchmark_dryrun"


def main():
    args = argparse.Namespace(
        no_vgg=True, compute_dtype="bfloat16", ckpt_dir=None,
        load_size=624, fine_width=624, fine_height=192,
        data_root=os.path.join(WORK, "vkitti"),
        segm_dir=os.path.join(WORK, "segm"),
        geo_dir=os.path.join(WORK, "geo"))
    trainer, state = load_trainer(args)
    wh = (args.fine_width, args.fine_height)
    items = benchmark_split(
        load_edit_json("/root/reference/assets/vkitti_edit_benchmark.json"))
    items = [it for it in items
             if os.path.exists(os.path.join(args.geo_dir,
                                            f"{it.target_name}.json"))][:N]
    print(f"{len(items)} pairs")

    t = {"load": 0.0, "generate": 0.0, "metrics": 0.0}
    for i, item in enumerate(items):
        t0 = time.perf_counter()
        src = os.path.join(args.data_root, "vkitti_1.3.1_rgb", item.world,
                           item.topic, f"{item.source}.png")
        tgt = os.path.join(args.data_root, "vkitti_1.3.1_rgb", item.world,
                           item.topic, f"{item.target}.png")
        segm = os.path.join(args.segm_dir, f"{item.source_name}.png")
        base_img_t = transform_image(Image.open(src).convert("RGB"),
                                     args.load_size, wh)
        base_label = (np.asarray(transform_image(
            Image.open(segm), args.load_size, wh, nearest=True,
            normalize=False)) * 255.0).astype(np.int32)[..., 0]
        target_t = transform_image(Image.open(tgt).convert("RGB"),
                                   args.load_size, wh)
        t1 = time.perf_counter()
        fake, _ = generate_edit_frame(trainer, state, base_img_t,
                                      base_label, args.geo_dir,
                                      item.target_name, wh, args)
        t2 = time.perf_counter()
        l1 = float(np.abs(fake - target_t).mean())
        lp = metrics.lpips(tensor2im(fake), tensor2im(target_t))
        t3 = time.perf_counter()
        if i > 0:          # skip the compile-laden first pair
            t["load"] += t1 - t0
            t["generate"] += t2 - t1
            t["metrics"] += t3 - t2
        else:
            print(f"pair 0 (compiles): load {t1-t0:.2f} gen {t2-t1:.2f} "
                  f"metrics {t3-t2:.2f}")
    n = len(items) - 1
    for k, v in t.items():
        print(f"{k:10s}: {v/n*1e3:8.1f} ms/pair")


if __name__ == "__main__":
    main()
