"""Full DerenderTrainer train-step timing with a component breakdown.

Measures at the production configuration (16 objects, full mode,
render_size=384 -> 768^2 AA raster, walk=64) on the real device:

  fwd            loss_fn value only (encoder + render + losses)
  grad           jax.grad(loss_fn) (no optimizer)
  step           full train step (grad + Adam update)
  step[geo]      train step with mode=geometry (no render) = encoder cost

Run: python scripts/prof_train_step.py [render_size] [batch]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from sdn3d_tpu.geometry.assets import load_shapenet_bank
from sdn3d_tpu.models.derenderer import (Derenderer, DeviceMeshBank,
                                         TargetType)
from sdn3d_tpu.pipelines.derender import DerenderTrainer

RENDER = int(sys.argv[1]) if len(sys.argv) > 1 else 384
B = int(sys.argv[2]) if len(sys.argv) > 2 else 16
FULL = TargetType.pretrain | TargetType.finetune


def fence(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0])


def timeit(name, fn, *args, iters=4, vary_img=None):
    out = fn(*args)
    fence(out)
    t0 = time.perf_counter()
    for i in range(iters):
        a = list(args)
        if vary_img is not None:
            b = dict(a[vary_img])
            b["images"] = b["images"] + 1e-5 * (i + 1)
            a[vary_img] = b
        out = fn(*a)
    fence(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:12s}: {dt:9.1f} ms")
    return dt


def make_batch(rng):
    return {
        "images": jnp.asarray(
            rng.rand(B, 224, 224, 3).astype(np.float32)),
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


def main():
    bank = DeviceMeshBank.from_host(
        load_shapenet_bank("/root/reference/geometric/assets"))
    model = Derenderer()
    rng = np.random.RandomState(0)
    batch = make_batch(rng)
    key = jax.random.PRNGKey(0)

    print(f"config: B={B} render_size={RENDER} (raster {RENDER*2}^2 AA), "
          f"full mode, walk=64")

    tr = DerenderTrainer(model=model, bank=None, mode=FULL,
                         render_size=RENDER)
    state = tr.init(key, batch)
    step = jax.jit(tr.make_train_step())

    # fwd-only: the loss value without any backward.
    def fwd_only(state, batch, key, bank):
        from sdn3d_tpu.models.derenderer import derender_forward
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        blob = derender_forward(variables, model, batch["images"],
                                batch["roi_norms"], batch["focals"], bank,
                                int(FULL), 256, RENDER, training=True,
                                rng=key, mutable=["batch_stats"])
        return sum(tr.losses(blob, batch).values())

    def grad_only(state, batch, key, bank):
        def loss_fn(params):
            from sdn3d_tpu.models.derenderer import derender_forward
            variables = {"params": params, "batch_stats": state.batch_stats}
            blob = derender_forward(variables, model, batch["images"],
                                    batch["roi_norms"], batch["focals"],
                                    bank, int(FULL), 256, RENDER,
                                    training=True, rng=key,
                                    mutable=["batch_stats"])
            return sum(tr.losses(blob, batch).values())
        return jax.grad(loss_fn)(state.params)

    t_fwd = timeit("fwd", jax.jit(fwd_only), state, batch, key, bank,
                   vary_img=1)
    t_grad = timeit("grad", jax.jit(grad_only), state, batch, key, bank,
                    vary_img=1)
    t_step = timeit("step", step, state, batch, key, bank, vary_img=1)

    tr_geo = DerenderTrainer(model=model, bank=None,
                             mode=TargetType.geometry, render_size=RENDER)
    state_g = tr_geo.init(key, batch)
    t_geo = timeit("step[geo]", jax.jit(tr_geo.make_train_step()),
                   state_g, batch, key, None, vary_img=1)

    print(f"\nbreakdown: encoder step {t_geo:.0f} ms | render fwd "
          f"{t_fwd - t_geo * 0.4:.0f}* | render VJP ~{t_grad - t_fwd:.0f} "
          f"| optimizer {t_step - t_grad:.0f} ms  (*fwd minus ~encoder fwd)")


if __name__ == "__main__":
    main()
