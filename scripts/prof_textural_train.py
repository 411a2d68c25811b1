"""Break down the textural production train iteration (192x624, B=1):
g_step, pooled_fake_concat (history-pool fetch), d_step, measured
separately and as the full alternation, f32 and bf16.

TRAIN_BENCH round-4 measured 775-795 ms/iter for the full alternation —
far above any compute bound at this size; this script attributes it.
"""
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

from sdn3d_tpu.pipelines.textural import TexturalConfig, TexturalTrainer


def fence(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0])


def timeit(name, run, iters=6):
    fence(run(0))
    t0 = time.perf_counter()
    out = None
    for i in range(1, iters + 1):
        out = run(i)
    fence(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:28s}: {dt:8.1f} ms", flush=True)
    return dt


def main():
    for dtype in sys.argv[1:] or ["float32"]:
        B, H, W = 1, 192, 624
        cfg = TexturalConfig(compute_dtype=dtype)
        trainer = TexturalTrainer(cfg)
        rng = np.random.RandomState(0)
        inst = np.zeros((B, H, W), np.int32)
        inst[:, :, W // 2:] = 1
        base = {
            "label": jnp.asarray(
                rng.randint(0, 14, (B, H, W)).astype(np.int32)),
            "inst": jnp.asarray(inst),
            "inst_slots": jnp.asarray(inst),
            "pose": jnp.asarray(
                rng.randint(0, 25, (B, H, W)).astype(np.int32)),
            "normal": jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32)),
        }
        image = rng.rand(B, H, W, 3).astype(np.float32) * 2 - 1
        state0 = trainer.init(jax.random.PRNGKey(0), H, W)
        g_step = jax.jit(trainer.make_g_step())
        d_step = jax.jit(trainer.make_d_step())

        print(f"== {dtype}")
        h = {"s": state0}

        def run_g(i):
            b = dict(base, image=jnp.asarray(image + 1e-5 * i))
            h["s"], losses = g_step(h["s"], b, jax.random.PRNGKey(i))
            return losses

        t_g = timeit("g_step", run_g)

        def run_pool(i):
            b = dict(base, image=jnp.asarray(image + 1e-5 * i))
            return trainer.pooled_fake_concat(h["s"], b,
                                              jax.random.PRNGKey(i))

        t_p = timeit("pooled_fake_concat", run_pool)
        fc = run_pool(99)

        def run_d(i):
            b = dict(base, image=jnp.asarray(image + 1e-5 * i))
            h["s"], losses = d_step(h["s"], b, jax.random.PRNGKey(i),
                                    fake_concat=fc)
            return losses

        t_d = timeit("d_step (fixed fake)", run_d)

        def run_full(i):
            key = jax.random.PRNGKey(i)
            b = dict(base, image=jnp.asarray(image + 1e-5 * i))
            h["s"], _ = g_step(h["s"], b, key)
            fk = trainer.pooled_fake_concat(h["s"], b, key)
            h["s"], losses = d_step(h["s"], b, key, fake_concat=fk)
            return losses

        t_f = timeit("full alternation", run_full)
        print(json.dumps({"dtype": dtype, "g_ms": round(t_g, 1),
                          "pool_ms": round(t_p, 1), "d_ms": round(t_d, 1),
                          "full_ms": round(t_f, 1)}))


if __name__ == "__main__":
    main()
