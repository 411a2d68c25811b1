"""Semantic branch training CLI (mirrors semantic/vkitti_train.py).

Trains the dilated-ResNet50+PPM segmenter on VKITTI scenegt with the
reference's dual poly-LR SGD schedule.  Data parallelism: the batch is
sharded over all local devices via the data mesh (replacing
UserScatteredDataParallel + SyncBN threads — BN stats are globally
synchronized by XLA automatically).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def build_argparser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_root", default=os.environ.get("VKITTI_ROOT_DIR"))
    p.add_argument("--ckpt_dir", default="./semantic_ckpt")
    p.add_argument("--num_class", type=int, default=14)
    p.add_argument("--compute_dtype", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--crop_size", type=int, default=256)
    p.add_argument("--lr_encoder", type=float, default=2e-2)
    p.add_argument("--lr_decoder", type=float, default=2e-2)
    p.add_argument("--max_iters", type=int, default=100_000)
    p.add_argument("--num_iters", type=int, default=100)
    p.add_argument("--save_every", type=int, default=1000)
    p.add_argument("--synthetic", action="store_true",
                   help="train on random data (smoke/benchmark mode)")
    return p


def synthetic_batches(args, rng):
    while True:
        yield (rng.rand(args.batch_size, args.crop_size, args.crop_size, 3
                        ).astype(np.float32),
               rng.randint(-1, args.num_class,
                           (args.batch_size, args.crop_size // 8,
                            args.crop_size // 8)).astype(np.int32))


def vkitti_batches(args, rng):
    """Random crops from VKITTI scenegt (semantic/vkitti_dataset.py)."""
    from PIL import Image

    from sdn3d_tpu.data.vkitti import get_tables, get_lists, decode_scenegt

    table = get_tables("segm", args.data_root)
    files = get_lists("train")
    while True:
        imgs, labels = [], []
        for _ in range(args.batch_size):
            f = files[rng.randint(len(files))]
            world, scene, frame = f.split("/")
            rgb = np.asarray(Image.open(os.path.join(
                args.data_root, "vkitti_1.3.1_rgb", f)).convert("RGB"))
            gt = np.asarray(Image.open(os.path.join(
                args.data_root, "vkitti_1.3.1_scenegt", f)).convert("RGB"))
            seg = decode_scenegt(gt, world, scene, table)
            H, W = rgb.shape[:2]
            s = args.crop_size
            y = rng.randint(max(1, H - s))
            x = rng.randint(max(1, W - s))
            from sdn3d_tpu.data.semantic_data import prepare_train_sample
            import random as _random
            out = prepare_train_sample(
                rgb[y:y + s, x:x + s], seg[y:y + s, x:x + s] + 1,
                _random.Random(int(rng.randint(1 << 30))),
                scales=(args.crop_size,))
            imgs.append(out["image"][:s, :s])
            labels.append(out["label"][:s // 8, :s // 8])
        yield np.stack(imgs), np.stack(labels)


def main(argv=None):
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sdn3d_tpu.core.checkpoint import save_checkpoint
    from sdn3d_tpu.models.semantic import SemanticModel
    from sdn3d_tpu.parallel import make_mesh_for_batch, shard_batch
    from sdn3d_tpu.pipelines.semantic import SemanticTrainer

    args = build_argparser().parse_args(argv)
    rng = np.random.RandomState(0)
    model = SemanticModel(num_class=args.num_class,
                          dtype=jnp.dtype(args.compute_dtype))
    trainer = SemanticTrainer(model, lr_encoder=args.lr_encoder,
                              lr_decoder=args.lr_decoder,
                              max_iters=args.max_iters)

    batches = (synthetic_batches(args, rng) if args.synthetic or
               not args.data_root else vkitti_batches(args, rng))
    imgs, labels = next(batches)
    state = trainer.init(jax.random.PRNGKey(0), jnp.asarray(imgs[:1]))

    mesh = make_mesh_for_batch(args.batch_size)
    state = jax.device_put(state, NamedSharding(mesh, P()))
    step_fn = jax.jit(trainer.make_train_step())

    for it in range(args.num_iters):
        imgs, labels = next(batches)
        b = shard_batch({"i": imgs, "l": labels}, mesh)
        state, metrics = step_fn(state, b["i"], b["l"],
                                 jax.random.PRNGKey(it))
        if it % 10 == 0:
            print(f"iter {it}: loss={float(metrics['loss']):.4f} "
                  f"acc={float(metrics['acc']):.4f}", flush=True)
        if (it + 1) % args.save_every == 0 or it + 1 == args.num_iters:
            save_checkpoint(args.ckpt_dir, it + 1, state,
                            meta=vars(args))
    print("done")


if __name__ == "__main__":
    main()
