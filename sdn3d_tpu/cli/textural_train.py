"""Textural branch (pix2pixHD) training CLI (mirrors textural/train.py):
alternating G/D Adam steps with checkpoint/resume."""

from __future__ import annotations

import argparse
import os

import numpy as np


def build_argparser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_root", default=os.environ.get("VKITTI_ROOT_DIR"))
    p.add_argument("--segm_dir", default=None)
    p.add_argument("--geo_dir", default=None)
    p.add_argument("--ckpt_dir", default="./textural_ckpt")
    p.add_argument("--compute_dtype", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--load_size", type=int, default=624)
    p.add_argument("--fine_width", type=int, default=624)
    p.add_argument("--fine_height", type=int, default=192)
    p.add_argument("--num_iters", type=int, default=50)
    p.add_argument("--save_every", type=int, default=1000)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--no_vgg", action="store_true")
    p.add_argument("--use_global_encoder", action="store_true",
                   help="global VAE latent conditioning + KL loss "
                        "(reference --no_global_encoder=0)")
    p.add_argument("--pool_size", type=int, default=0,
                   help="GAN history buffer for the D fake loss")
    p.add_argument("--split", default="train", choices=["train", "test"],
                   help="VKITTI split to enumerate (the synthetic "
                        "benchmark fixture's frames all fall in 'test'; "
                        "scripts/quality_scratch.py overfits them "
                        "deliberately)")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--no_augment", action="store_true",
                   help="disable train-time color jitter "
                        "(reference --use_augmentation default True)")
    p.add_argument("--small", action="store_true",
                   help="small nets (smoke mode)")
    return p


def synthetic_batch(args, rng, cfg):
    import jax.numpy as jnp

    H, W = args.fine_height, args.fine_width
    B = args.batch_size
    inst = rng.randint(0, 4, (B, H, W)).astype(np.int32)
    return {
        "label": jnp.asarray(rng.randint(0, cfg.label_nc,
                                         (B, H, W)).astype(np.int32)),
        "inst": jnp.asarray(inst * 1000),
        "inst_slots": jnp.asarray(inst),
        "image": jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32) * 2 - 1),
        "pose": jnp.asarray(rng.randint(0, cfg.pose_bins + 1,
                                        (B, H, W)).astype(np.int32)),
        "normal": jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32)),
    }


def main(argv=None):
    import jax

    from sdn3d_tpu.core.checkpoint import (
        latest_step, restore_checkpoint, save_checkpoint)
    from sdn3d_tpu.pipelines.textural import (SMALL_NET_OVERRIDES,
                                              TexturalConfig, TexturalTrainer)

    args = build_argparser().parse_args(argv)
    common = dict(use_vgg_loss=not args.no_vgg, lr=args.lr,
                  use_global_encoder=args.use_global_encoder,
                  pool_size=args.pool_size,
                  compute_dtype=args.compute_dtype)
    if args.small:
        common.update(SMALL_NET_OVERRIDES)
    cfg = TexturalConfig(**common)
    trainer = TexturalTrainer(cfg)
    rng = np.random.RandomState(0)

    dataset = None
    if not args.synthetic and args.data_root and args.segm_dir \
            and args.geo_dir:
        from sdn3d_tpu.data.textural_data import TexturalVKittiDataset
        dataset = TexturalVKittiDataset(
            args.data_root, args.segm_dir, args.geo_dir, split=args.split,
            load_size=args.load_size,
            fine_wh=(args.fine_width, args.fine_height),
            max_instances=cfg.max_instances,
            augment=not args.no_augment)
        print(f"train set: {len(dataset)} frames")
    elif not args.synthetic and (args.data_root or args.segm_dir
                                 or args.geo_dir):
        raise SystemExit("dataset mode needs --data_root AND --segm_dir "
                         "AND --geo_dir (semantic + geometric precomputed "
                         "outputs, textural/README.md Train); pass "
                         "--synthetic for random batches")

    state = trainer.init(jax.random.PRNGKey(0), args.fine_height,
                         args.fine_width)
    if latest_step(args.ckpt_dir) is not None:
        state, step0 = restore_checkpoint(args.ckpt_dir, state)
        print(f"resumed from step {step0}")

    # one fused jit per iteration: G update + device-resident history
    # pool + D update (pipelines/textural.py:make_train_iteration) — no
    # per-iteration host round-trips
    train_iter = jax.jit(trainer.make_train_iteration())
    pool = (trainer.device_pool(args.fine_height, args.fine_width)
            if cfg.pool_size > 0 else None)

    import jax.numpy as jnp
    for it in range(args.num_iters):
        if dataset is not None:
            batch = {k: jnp.asarray(v) for k, v in
                     dataset.batch(rng, args.batch_size).items()}
        else:
            batch = synthetic_batch(args, rng, cfg)
        state, losses, pool = train_iter(state, batch,
                                         jax.random.PRNGKey(it), pool)
        if it % 10 == 0:
            msg = " ".join(f"{k}={float(v):.3f}"
                           for k, v in losses.items())
            print(f"iter {it}: {msg}", flush=True)
        if (it + 1) % args.save_every == 0 or it + 1 == args.num_iters:
            save_checkpoint(args.ckpt_dir, it + 1, state, meta=vars(args))
    print("done")


if __name__ == "__main__":
    main()
