"""Geometric branch (derenderer) training CLI (mirrors
geometric/scripts/main.py --do train).

Modes map to TargetType bitmasks (derender3d/__init__.py): pretrain
(geometry-only losses), full (geometry + reprojection), finetune, extend.
Data parallelism via the device mesh; the mesh bank is threaded through
jit as an argument.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def build_argparser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--mode", choices=["pretrain", "full", "finetune",
                                      "extend"], default="full")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--image_size", type=int, default=256)
    p.add_argument("--render_size", type=int, default=384)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--weight_decay", type=float, default=1e-3)
    p.add_argument("--mask_weight", type=float, default=0.1)
    p.add_argument("--ffd_coeff_reg", type=float, default=1.0)
    p.add_argument("--num_iters", type=int, default=50)
    p.add_argument("--save_every", type=int, default=1000)
    p.add_argument("--ckpt_dir", default="./derender_ckpt")
    p.add_argument("--compute_dtype", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--shapenet_root",
                   default=os.environ.get("SHAPENET_ROOT_DIR"))
    p.add_argument("--synthetic", action="store_true",
                   help="synthetic mesh bank + random batches (smoke mode)")
    p.add_argument("--dataset",
                   choices=["vkitti", "kitti", "cityscapes"],
                   default="vkitti",
                   help="training corpus; selection by (dataset, mode) "
                        "mirrors derender3d/data_loader.py:43-82 incl. "
                        "the kitti-full weighted hybrid and the "
                        "cityscapes 0.75/0.25 vkitti mix")
    p.add_argument("--vkitti_root",
                   default=os.environ.get("VKITTI_ROOT_DIR"),
                   help="train on real VKITTI per-object items (threaded "
                        "prefetch loader); otherwise synthetic batches")
    p.add_argument("--kitti_object_root",
                   default=os.environ.get("KITTI_OBJECT_ROOT_DIR"))
    p.add_argument("--kitti_semantics_root",
                   default=os.environ.get("KITTI_SEMANTICS_ROOT_DIR"))
    p.add_argument("--cityscapes_root",
                   default=os.environ.get("CITYSCAPES_ROOT_DIR"))
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--grad_walk", type=int, default=64)
    return p


def main(argv=None):
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sdn3d_tpu.core.checkpoint import save_checkpoint
    from sdn3d_tpu.data.synthetic import make_derender_batch, make_sphere_mesh
    from sdn3d_tpu.geometry.assets import build_mesh_bank, load_shapenet_bank
    from sdn3d_tpu.models.derenderer import (
        Derenderer, DeviceMeshBank, TargetType)
    from sdn3d_tpu.parallel import make_mesh_for_batch, shard_batch
    from sdn3d_tpu.pipelines.derender import DerenderTrainer

    args = build_argparser().parse_args(argv)
    mode = TargetType.BY_NAME[args.mode]

    if args.synthetic or not args.shapenet_root:
        verts, faces = make_sphere_mesh(8, 16)
        bank_host = build_mesh_bank([(verts, faces)] * 8)
        print("synthetic mesh bank (8x sphere)")
    else:
        bank_host = load_shapenet_bank(args.shapenet_root)
    bank = DeviceMeshBank.from_host(bank_host)

    import jax.numpy as jnp
    model = Derenderer(num_classes=8,
                       dtype=jnp.dtype(args.compute_dtype))
    trainer = DerenderTrainer(
        model=model, bank=bank, mode=mode, image_size=args.image_size,
        render_size=args.render_size, mask_weight=args.mask_weight,
        ffd_coeff_reg=args.ffd_coeff_reg, lr=args.lr,
        weight_decay=args.weight_decay)

    rng = np.random.RandomState(0)

    def make_batch(seed):
        b = make_derender_batch(args.batch_size, args.image_size, seed)
        if mode & TargetType.reproject:
            b["masks"] = np.zeros(
                (args.batch_size, 1, args.render_size, args.render_size),
                np.float32)
            b["masks"][:, :, args.render_size // 4:-args.render_size // 4,
                       args.render_size // 4:-args.render_size // 4] = 1.0
            b["ignores"] = np.zeros_like(b["masks"])
        return {k: jnp.asarray(v) for k, v in b.items()}

    mesh = make_mesh_for_batch(args.batch_size)

    have_real_data = ((args.dataset == "vkitti" and args.vkitti_root)
                      or (args.dataset == "kitti"
                          and (args.kitti_object_root
                               or args.kitti_semantics_root))
                      or (args.dataset == "cityscapes"
                          and args.cityscapes_root))

    def batches():
        """Real per-object stream (dataset picked by (dataset, mode) per
        the reference's data_loader) or synthetic smoke batches."""
        if have_real_data and not args.synthetic:
            from sdn3d_tpu.data.loader import PrefetchLoader
            from sdn3d_tpu.data.select import select_derender_dataset
            from sdn3d_tpu.parallel import batch_sharding

            ds, sampler = select_derender_dataset(
                args.dataset, mode,
                vkitti_root=args.vkitti_root,
                kitti_object_root=args.kitti_object_root,
                kitti_semantics_root=args.kitti_semantics_root,
                cityscapes_root=args.cityscapes_root,
                is_train=True, image_size=args.image_size,
                render_size=args.render_size)
            print(f"{args.dataset} derender dataset: {len(ds)} objects"
                  + (" (weighted hybrid sampler)" if sampler else ""))
            it = 0
            while it < args.num_iters:
                loader = PrefetchLoader(ds, args.batch_size,
                                        sampler=sampler,
                                        num_workers=args.num_workers,
                                        sharding=batch_sharding(mesh),
                                        seed=it)
                for b in loader:
                    yield b
                    it += 1
                    if it >= args.num_iters:
                        return
        else:
            for i in range(args.num_iters):
                yield shard_batch(make_batch(i + 1), mesh)

    batch = make_batch(0)
    state = trainer.init(jax.random.PRNGKey(0), batch)

    state = jax.device_put(state, NamedSharding(mesh, P()))
    bank_r = jax.device_put(bank, NamedSharding(mesh, P()))
    step_fn = jax.jit(trainer.make_train_step())

    for it, batch in enumerate(batches()):
        state, losses = step_fn(state, batch, jax.random.PRNGKey(it), bank_r)
        if it % 10 == 0:
            msg = " ".join(f"{k}={float(v):.4f}" for k, v in losses.items())
            print(f"iter {it}: {msg}", flush=True)
        if (it + 1) % args.save_every == 0 or it + 1 == args.num_iters:
            save_checkpoint(args.ckpt_dir, it + 1, state, meta=vars(args))
    print("done")


if __name__ == "__main__":
    main()
