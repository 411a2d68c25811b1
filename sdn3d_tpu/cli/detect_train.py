"""Mask R-CNN training CLI (mirrors maskrcnn/vkitti.py train /
maskrcnn/cityscapes.py train).

Drives the 4-stage COCO transfer schedule (vkitti.py:211-243): stage-0
class-count transfer at lr 1e-5 (only the class-dependent output layers),
then heads / 4+ / all with the reference LR ladder.  `--stage` trains a
single stage instead (the reference's per-call train_model usage).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def build_argparser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", choices=["vkitti", "cityscapes",
                                         "synthetic"], default="vkitti")
    p.add_argument("--data_root", default=os.environ.get("VKITTI_ROOT_DIR"))
    p.add_argument("--coco_ckpt", default=None,
                   help="reference COCO .pth to port as the starting "
                        "point (utils/port.py:port_maskrcnn)")
    p.add_argument("--ckpt_dir", default="./maskrcnn_ckpt")
    p.add_argument("--stage", default=None,
                   choices=[None, "transfer", "heads", "4+", "all"],
                   help="train one freezing stage only; default runs the "
                        "full cumulative schedule")
    p.add_argument("--lr", type=float, default=1e-3,
                   help="base LR (config.py LEARNING_RATE); stage LRs are "
                        "scaled from it per the reference ladder")
    p.add_argument("--num_iters", type=int, default=50,
                   help="steps per epoch (reference: full dataset)")
    p.add_argument("--num_epochs", type=int, default=None,
                   help="cap on total epochs (default: schedule's 100)")
    p.add_argument("--image_dim", type=int, default=None,
                   help="override image_min_dim/image_max_dim (smoke runs)")
    p.add_argument("--num_classes", type=int, default=None,
                   help="default: 3 for vkitti (bg/car/van), 2 for "
                        "cityscapes (bg/car)")
    p.add_argument("--compute_dtype", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--save_every", type=int, default=5,
                   help="epochs between checkpoints (model.py:1907: 5)")
    p.add_argument("--small", action="store_true",
                   help="tiny backbone/ROI config for smoke runs/tests")
    return p


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from sdn3d_tpu.core.checkpoint import save_checkpoint
    from sdn3d_tpu.data.detect_data import (
        CityscapesDetectDataset, VKittiDetectDataset,
        synthetic_detect_example)
    from sdn3d_tpu.models.maskrcnn import (MaskRCNNConfig,
                                           generate_pyramid_anchors)
    from sdn3d_tpu.pipelines.detect_train import (MaskRCNNTrainer,
                                                  run_schedule)

    args = build_argparser().parse_args(argv)

    num_classes = args.num_classes or (2 if args.dataset == "cityscapes"
                                       else 3)
    cfg_kw = dict(num_classes=num_classes,
                  compute_dtype=args.compute_dtype)
    if args.small:
        cfg_kw.update(stage_sizes=(1, 1, 1, 1), fpn_channels=32,
                      pre_nms_limit=100, post_nms_rois_training=40,
                      train_rois_per_image=12, mask_shape=(14, 14),
                      mask_pool_size=7, rpn_train_anchors_per_image=32)
        args.image_dim = args.image_dim or 128
    if args.image_dim:
        cfg_kw.update(image_min_dim=args.image_dim,
                      image_max_dim=args.image_dim)
    config = MaskRCNNConfig(**cfg_kw)
    anchors_np = np.asarray(generate_pyramid_anchors(config))

    if args.dataset == "vkitti" and args.data_root:
        ds = VKittiDetectDataset(args.data_root, config, anchors_np)
        print(f"VKITTI detect dataset: {len(ds)} frames")
    elif args.dataset == "cityscapes" and args.data_root:
        ds = CityscapesDetectDataset(args.data_root, config, anchors_np)
        print(f"Cityscapes detect dataset: {len(ds)} frames")
    else:
        ds = None
        print("synthetic detect examples (smoke mode)")

    trainer0 = MaskRCNNTrainer(config=config, stage="heads",
                               learning_rate=args.lr)
    state = trainer0.init(jax.random.PRNGKey(0))
    if args.coco_ckpt:
        import torch
        from sdn3d_tpu.utils.port import port_maskrcnn
        sd = torch.load(args.coco_ckpt, map_location="cpu")
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        variables = port_maskrcnn(sd)
        state["params"] = variables["params"]
        state["batch_stats"] = variables.get("batch_stats",
                                             state["batch_stats"])
        state["opt_state"] = trainer0.tx.init(state["params"])
        print(f"ported weights from {args.coco_ckpt}")

    order = np.random.RandomState(0)

    def example(i):
        if ds is None:
            return synthetic_detect_example(config, anchors_np, seed=i)
        return ds[int(order.randint(len(ds)))]

    step_cache = {}
    epochs_done = 0

    def epoch_fn(trainer, state, epoch):
        nonlocal epochs_done
        key = trainer.stage
        if key not in step_cache:
            step_cache[key] = jax.jit(trainer.make_train_step())
        step = step_cache[key]
        losses = {}
        for it in range(args.num_iters):
            ex = example(epoch * args.num_iters + it)
            new_state, losses = step(
                state, jnp.asarray(ex["image"])[None],
                jnp.asarray(ex["rpn_match"]), jnp.asarray(ex["rpn_bbox"]),
                jnp.asarray(ex["gt_class_ids"]),
                jnp.asarray(ex["gt_boxes"]), jnp.asarray(ex["gt_masks"]),
                jax.random.PRNGKey(epoch * 100003 + it), trainer.anchors)
            state = dict(new_state)
        epochs_done = max(epochs_done, epoch + 1)
        if losses:
            msg = " ".join(f"{k}={float(v):.4f}" for k, v in losses.items())
            print(f"[{trainer.stage}] epoch {epoch}: {msg}", flush=True)
        if (epoch + 1) % args.save_every == 0:
            save_checkpoint(args.ckpt_dir, epoch + 1, state,
                            meta=vars(args))
        return state

    if args.stage:
        trainer = MaskRCNNTrainer(config=config, stage=args.stage,
                                  learning_rate=args.lr)
        state["opt_state"] = trainer.tx.init(state["params"])
        for epoch in range(args.num_epochs or 1):
            state = epoch_fn(trainer, state, epoch)
    else:
        def make_trainer(stage, learning_rate):
            return MaskRCNNTrainer(config=config, stage=stage,
                                   learning_rate=learning_rate)

        cap = args.num_epochs

        def capped_epoch_fn(trainer, state, epoch):
            if cap is not None and epoch >= cap:
                return state
            return epoch_fn(trainer, state, epoch)

        state = run_schedule(make_trainer, state,
                             include_transfer=args.coco_ckpt is not None,
                             base_lr=args.lr, epoch_fn=capped_epoch_fn)

    # Final state at the TRUE epoch count, so latest_step() resolves to it
    # (a step-0 save would be shadowed by every periodic epoch checkpoint).
    # Skip when the last epoch already checkpointed itself.
    if epochs_done == 0 or epochs_done % args.save_every != 0:
        save_checkpoint(args.ckpt_dir, epochs_done, state, meta=vars(args))
    print("done")


if __name__ == "__main__":
    main()
