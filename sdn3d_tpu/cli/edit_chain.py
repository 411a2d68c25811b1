"""Fused single-process 92-pair edit benchmark driver.

Runs the full edit protocol — semantic labels, geometric de-render +
edit + re-render, textural regeneration, L1/LPIPS vs the target — in ONE
process with all three branch programs jit-cached (pipelines/chain.py),
instead of the reference's three processes glued by PNG files
(README.md:153-189).  Output is byte-identical to driving
`cli/semantic_test` -> `cli/geometric_main` -> `cli/edit_benchmark`
through the filesystem; what changes is the honest end-to-end cost: no
per-stage process startup, recompilation, or PNG round-trips.

Use `--dump_dirs` to also write the standard per-stage file contract.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def build_argparser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--edit_json", required=True)
    p.add_argument("--data_root", default=os.environ.get("VKITTI_ROOT_DIR"))
    p.add_argument("--shapenet_root",
                   default=os.environ.get("SHAPENET_ROOT_DIR"))
    p.add_argument("--source", choices=["gt", "maskrcnn"], default="gt")
    p.add_argument("--semantic_ckpt", default=None)
    p.add_argument("--derender_ckpt", default=None)
    p.add_argument("--textural_ckpt", default=None)
    p.add_argument("--maskrcnn_ckpt", default=None)
    p.add_argument("--results_dir", default="./benchmark_chain_out")
    p.add_argument("--dump_dirs", default=None,
                   help="write the standard file contract under "
                        "DIR/segm and DIR/geo as a side effect")
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--batch_pairs", type=int, default=1,
                   help="process N pairs per device program "
                        "(EditChain.edit_frames): one batched geometric "
                        "render + one batched textural forward per "
                        "chunk; the last chunk is padded by repetition "
                        "so every chunk compiles to the same shape")
    p.add_argument("--pipeline", action="store_true",
                   help="overlap chunks in a 3-deep software pipeline "
                        "(EditChain.edit_frames_pipelined): the next "
                        "chunks' semantic/detect/encode and render run "
                        "on device while the host packages, conditions "
                        "and scores the current one; outputs are "
                        "byte-identical to the serial path")
    # stage shape knobs (defaults = the per-stage CLI defaults)
    p.add_argument("--scales", type=int, nargs="+",
                   default=[100, 150, 200, 300, 375])
    p.add_argument("--image_size", type=int, default=256)
    p.add_argument("--render_size", type=int, default=384)
    p.add_argument("--num_opts", type=int, default=0)
    p.add_argument("--mode", default="extend")
    p.add_argument("--load_size", type=int, default=624)
    p.add_argument("--fine_width", type=int, default=624)
    p.add_argument("--fine_height", type=int, default=192)
    p.add_argument("--compute_dtype", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--full_fetch", action="store_true",
                   help="fetch full-resolution geometric maps per pair "
                        "instead of the device-downsized serving planes "
                        "(automatic with --dump_dirs; outputs are "
                        "byte-identical either way)")
    p.add_argument("--phases", action="store_true",
                   help="record a per-phase wall-clock + transfer-byte "
                        "breakdown (utils/phases.py) into the result "
                        "JSON; adds block_until_ready barriers between "
                        "phases, so use for attribution, not headlines")
    p.add_argument("--lpips_ckpt", default=None,
                   help="ported LPIPS checkpoint (.pth, official lpips "
                        "package layout); without it the LPIPS column "
                        "uses a random-init backbone (uncalibrated)")
    return p


def main(argv=None):
    from PIL import Image

    from sdn3d_tpu.cli.geometric_main import _keep_largest
    from sdn3d_tpu.data import vkitti as VK
    from sdn3d_tpu.data.textural_data import transform_image
    from sdn3d_tpu.pipelines.chain import ChainConfig, EditChain
    from sdn3d_tpu.utils import metrics
    from sdn3d_tpu.utils.visualizer import HTMLGallery, tensor2im

    args = build_argparser().parse_args(argv)
    if args.phases:
        from sdn3d_tpu.utils import phases
        phases.reset(True)
    cfg = ChainConfig(scales=tuple(args.scales), image_size=args.image_size,
                      render_size=args.render_size, num_opts=args.num_opts,
                      mode=args.mode, load_size=args.load_size,
                      fine_width=args.fine_width,
                      fine_height=args.fine_height,
                      compute_dtype=args.compute_dtype,
                      small_fetch=not (args.full_fetch or args.dump_dirs))
    chain = EditChain.build(
        cfg, args.shapenet_root, semantic_ckpt=args.semantic_ckpt,
        derender_ckpt=args.derender_ckpt, textural_ckpt=args.textural_ckpt,
        maskrcnn_ckpt=args.maskrcnn_ckpt,
        with_detector=(args.source == "maskrcnn"))

    items = VK.benchmark_split(VK.load_edit_json(args.edit_json))
    if args.limit:
        items = items[:args.limit]
    table_inst = (VK.get_tables("inst", args.data_root)
                  if args.source == "gt" else None)
    gallery = HTMLGallery(args.results_dir, "fused 92-pair edit benchmark")
    wh = (args.fine_width, args.fine_height)

    lpips_vars = (metrics.load_lpips(args.lpips_ckpt)
                  if args.lpips_ckpt else None)
    l1s, lpipss, ssims, psnrs = [], [], [], []
    pair_times = []    # (seconds, pairs) per processed chunk
    dets_cache = {}    # GT decode per source (scenegt PNG + LUT walk)
    scoring_s = 0.0    # metric/gallery/dump cost — NOT part of the edit
    batch_n = max(1, args.batch_pairs)

    def build_request(item):
        frame = int(item.source)
        image = np.asarray(Image.open(VK.rgb_path(
            args.data_root, item.world, item.topic,
            frame)).convert("RGB"))
        dets = None
        if table_inst is not None:
            dets = dets_cache.get(item.source_name)
            if dets is None:
                dets = _keep_largest(chain.infer_cfg, *VK.gt_objects(
                    args.data_root, item.world, item.topic, frame,
                    table_inst))
                dets_cache[item.source_name] = dets
        return {"image_rgb": image, "operations": item.operations,
                "dets": dets, "cache_key": item.source_name}

    chunk_lists = [items[c0:c0 + batch_n]
                   for c0 in range(0, len(items), batch_n)]

    def run_serial():
        for chunk in chunk_lists:
            tp = time.perf_counter()
            requests = [build_request(it) for it in chunk]
            if batch_n == 1:
                r = requests[0]
                outs = [chain.edit_frame(r["image_rgb"],
                                         operations=r["operations"],
                                         dets=r["dets"],
                                         cache_key=r["cache_key"])]
            else:
                # pad the tail chunk by repetition: one compiled shape
                # for every chunk; padded outputs are dropped
                pad = batch_n - len(requests)
                outs = chain.edit_frames(requests + [requests[-1]] * pad)
                outs = outs[:len(requests)]
            pair_times.append((time.perf_counter() - tp, len(chunk)))
            yield chunk, outs

    def run_pipelined():
        # the generator builds each chunk's requests lazily, so the
        # pipeline looks exactly one chunk ahead in host memory
        def gen():
            for chunk in chunk_lists:
                requests = [build_request(it) for it in chunk]
                pad = batch_n - len(requests)
                yield requests + [requests[-1]] * pad
        tp = time.perf_counter()
        for chunk, outs in zip(chunk_lists,
                               chain.edit_frames_pipelined(gen())):
            # yield-to-yield wall, excluding this chunk's scoring below
            # (device work for LATER chunks keeps running during both —
            # per-chunk walls attribute, the honest end-to-end number is
            # chain_s/wall_s_total)
            pair_times.append((time.perf_counter() - tp, len(chunk)))
            yield chunk, outs[:len(chunk)]
            tp = time.perf_counter()

    runner = run_pipelined() if args.pipeline else run_serial()
    for chunk, outs in runner:
        ts = time.perf_counter()
        for item, out in zip(chunk, outs):
            tgt = os.path.join(args.data_root, "vkitti_1.3.1_rgb",
                               item.world, item.topic,
                               f"{item.target}.png")
            target_t = transform_image(Image.open(tgt).convert("RGB"),
                                       args.load_size, wh)
            l1 = float(np.abs(out["fake"] - target_t).mean())
            lp = metrics.lpips(tensor2im(out["fake"]), tensor2im(target_t),
                               variables=lpips_vars)
            l1s.append(l1)
            lpipss.append(lp)
            # weight-free quality metrics (utils/metrics.py, the
            # reference's own grab-bag, util2.py:48-59) — unlike the
            # random-init LPIPS these are calibration-independent
            ssims.append(metrics.ssim(tensor2im(out["fake"]),
                                      tensor2im(target_t)))
            psnrs.append(metrics.psnr(tensor2im(out["fake"]),
                                      tensor2im(target_t)))
            gallery.add_images({"generated": tensor2im(out["fake"]),
                                "target": tensor2im(target_t)},
                               item.target_name)
            if args.dump_dirs:
                chain.dump(out["label"], out["geo"],
                           os.path.join(args.dump_dirs, "segm"),
                           os.path.join(args.dump_dirs, "geo"),
                           item.source_name, item.target_name)
            print(f"{item.target_name}: L1={l1:.4f} LPIPS={lp:.4f}")
        scoring_s += time.perf_counter() - ts
    dt = float(sum(t for t, _ in pair_times))  # edit work; scoring excluded

    result = {
        "mean_L1": float(np.mean(l1s)),
        "mean_LPIPS": float(np.mean(lpipss)),
        "mean_SSIM": float(np.mean(ssims)),
        "mean_PSNR": float(np.mean(psnrs)),
        "lpips_backbone": "ported" if lpips_vars is not None
                          else "random-init (uncalibrated)",
        "pairs": len(l1s),
        "batch_pairs": batch_n,
        "pipelined": bool(args.pipeline),
        "chain_s": dt,
        "scoring_s": round(scoring_s, 3),
        "stage_s": {k: round(v, 3) for k, v in chain.stage_s.items()},
        # all three stages, one process — directly comparable to the
        # reference protocol's end-to-end cost
        "edits_per_sec": len(l1s) / dt,
    }
    if len(pair_times) > 1:
        # serving-rate view: jit compiles land on the first chunk
        tail_s = sum(t for t, _ in pair_times[1:])
        tail_pairs = sum(n for _, n in pair_times[1:])
        steady = tail_s / tail_pairs
        result["steady_s_per_pair"] = steady
        result["steady_edits_per_sec"] = 1.0 / steady
    if args.phases:
        result["phase_breakdown"] = phases.snapshot()
    os.makedirs(args.results_dir, exist_ok=True)
    with open(os.path.join(args.results_dir, "benchmark.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    gallery.save()


if __name__ == "__main__":
    main()
