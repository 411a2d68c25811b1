"""Semantic / textural train-step timing: float32 vs bfloat16 compute."""
import time

import numpy as np
import jax
import jax.numpy as jnp


def fence(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0])


def timeit(name, fn, *args, iters=5):
    out = fn(*args)
    fence(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(*args)
        args = jax.tree_util.tree_map(
            lambda a: a if not (hasattr(a, "dtype")
                                and a.dtype == jnp.float32)
            else a + 1e-6, args)
    fence(out)
    print(f"{name:34s}: {(time.perf_counter()-t0)/iters*1e3:9.1f} ms")


def semantic(dt):
    from sdn3d_tpu.models.semantic import SemanticModel
    from sdn3d_tpu.pipelines.semantic import SemanticTrainer

    rng = np.random.RandomState(0)
    model = SemanticModel(num_class=14, dtype=jnp.dtype(dt))
    tr = SemanticTrainer(model)
    imgs = jnp.asarray(rng.rand(2, 376, 1248, 3).astype(np.float32))
    labels = jnp.asarray(rng.randint(-1, 14, (2, 47, 156)).astype(np.int32))
    state = tr.init(jax.random.PRNGKey(0), imgs)
    step = jax.jit(tr.make_train_step())
    key = jax.random.PRNGKey(1)
    timeit(f"semantic train step {dt}",
           lambda s: step(s, imgs, labels, key)[0], state)


def textural(dt):
    from sdn3d_tpu.pipelines.textural import TexturalConfig, TexturalTrainer

    rng = np.random.RandomState(0)
    cfg = TexturalConfig(compute_dtype=dt)
    tr = TexturalTrainer(cfg)
    state = tr.init(jax.random.PRNGKey(0), 192, 624)
    batch = {
        "label": jnp.asarray(rng.randint(0, 14, (1, 192, 624))),
        "inst": jnp.asarray(rng.randint(0, 30, (1, 192, 624))),
        "inst_slots": jnp.asarray(rng.randint(0, 30, (1, 192, 624))),
        "image": jnp.asarray(rng.rand(1, 192, 624, 3).astype(np.float32) * 2
                             - 1),
        "pose": jnp.asarray(rng.randint(0, 25, (1, 192, 624))),
        "normal": jnp.asarray(rng.rand(1, 192, 624, 3).astype(np.float32)),
    }
    g_step = jax.jit(tr.make_g_step())
    d_step = jax.jit(tr.make_d_step())
    timeit(f"textural G step {dt}", lambda s: g_step(s, batch)[0], state)
    timeit(f"textural D step {dt}", lambda s: d_step(s, batch)[0], state)


if __name__ == "__main__":
    import sys
    which = sys.argv[1] if len(sys.argv) > 1 else "semantic"
    for dt in ("float32", "bfloat16"):
        if which in ("semantic", "all"):
            semantic(dt)
        if which in ("textural", "all"):
            textural(dt)
