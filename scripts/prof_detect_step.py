"""Mask R-CNN inference + derenderer full train step timing on the TPU."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def fence(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0])


def timeit(name, fn, *args, iters=4):
    out = fn(*args)
    fence(out)
    t0 = time.perf_counter()
    for i in range(iters):
        a = [x + 1e-6 * (i + 1)
             if hasattr(x, "dtype") and x.dtype == jnp.float32 else x
             for x in args]
        out = fn(*a)
    fence(out)
    print(f"{name:36s}: {(time.perf_counter()-t0)/iters*1e3:9.1f} ms")


def maskrcnn(dt):
    from sdn3d_tpu.models.maskrcnn import (MaskRCNN, MaskRCNNConfig,
                                           generate_pyramid_anchors)
    cfg = MaskRCNNConfig(compute_dtype=dt)
    model = MaskRCNN(cfg)
    anchors = jnp.asarray(generate_pyramid_anchors(cfg))
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(1, 1024, 1024, 3).astype(np.float32) * 100)
    window = (0.0, 0.0, 375.0, 1242.0)
    variables = model.init(jax.random.PRNGKey(0), img, anchors, window)

    def infer(img):
        out = model.apply(variables, img, anchors, window)
        return out["detections"], out["masks"]
    timeit(f"maskrcnn inference 1024^2 {dt}", jax.jit(infer), img)


def derender_step(dt, render_size=768):
    from sdn3d_tpu.geometry.assets import load_shapenet_bank
    from sdn3d_tpu.models.derenderer import (Derenderer, DeviceMeshBank,
                                             TargetType)
    from sdn3d_tpu.pipelines.derender import DerenderTrainer

    bank = DeviceMeshBank.from_host(
        load_shapenet_bank("/root/reference/geometric/assets"))
    model = Derenderer(num_classes=8, dtype=jnp.dtype(dt))
    tr = DerenderTrainer(model, None, TargetType.full,
                         render_size=render_size)
    rng = np.random.RandomState(0)
    B = 16
    batch = {
        "images": jnp.asarray(rng.rand(B, 224, 224, 3).astype(np.float32)),
        "roi_norms": jnp.asarray(
            np.stack([np.full(B, -0.4), np.full(B, -0.4),
                      rng.uniform(0.1, 0.4, B),
                      rng.uniform(0.1, 0.4, B)], 1).astype(np.float32)),
        "focals": jnp.full((B, 1), 725.0),
        "targets": jnp.full((B,), TargetType.full, jnp.int32),
        "thetas": jnp.asarray(rng.rand(B, 1).astype(np.float32)),
        "translation2ds": jnp.asarray(rng.rand(B, 2).astype(np.float32)),
        "log_scales": jnp.asarray(rng.rand(B, 3).astype(np.float32)),
        "log_depths": jnp.asarray(rng.rand(B, 1).astype(np.float32)),
        "masks": jnp.asarray(
            (rng.rand(B, 1, render_size, render_size) > 0.7)
            .astype(np.float32)),
        "ignores": jnp.zeros((B, 1, render_size, render_size), jnp.float32),
    }
    state = tr.init(jax.random.PRNGKey(0), batch)
    step = jax.jit(tr.make_train_step())
    key = jax.random.PRNGKey(1)

    def run(images):
        b = dict(batch)
        b["images"] = images
        new_state, losses = step(state, b, key, bank)
        # consume the updated params so XLA cannot DCE the backward
        psum = sum(jnp.sum(x) for x in
                   jax.tree_util.tree_leaves(new_state.params))
        return losses["mask_loss"] + 0.0 * psum
    timeit(f"derender full step {render_size}^2x16 {dt}",
           jax.jit(run), batch["images"])


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    for dt in ("float32", "bfloat16"):
        if which in ("maskrcnn", "all"):
            maskrcnn(dt)
        if which in ("derender", "all"):
            derender_step(dt)
