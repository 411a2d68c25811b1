"""Sparse Adam (NR-9 equivalent) vs a numpy transcription of the chainer
AdamRule semantics (neural_renderer/optimizers.py:19-34)."""
import jax
import jax.numpy as jnp
import numpy as np

from sdn3d_tpu.core.optimizers import sparse_adam, scale_by_sparse_adam


def chainer_adam_oracle(param, grads, lr, b1=0.9, b2=0.999, eps=1e-8,
                        lr_mult=1.0):
    """Chainer AdamRule semantics: the kernel's ``lr`` input is the
    bias-corrected property alpha*sqrt(1-b2^t)/(1-b1^t) with the GLOBAL
    step t (chainer/optimizers/adam.py AdamRule.lr), multiplied by the
    optional per-param ``param.lr``."""
    p = param.copy()
    m = np.zeros_like(p)
    v = np.zeros_like(p)
    for t, g in enumerate(grads, start=1):
        lr_t = lr * np.sqrt(1 - b2 ** t) / (1 - b1 ** t)
        live = g != 0
        m[live] += (1 - b1) * (g[live] - m[live])
        v[live] += (1 - b2) * (g[live] ** 2 - v[live])
        v[live] = np.maximum(v[live], 0)
        p[live] -= lr_t * lr_mult * m[live] / (np.sqrt(v[live]) + eps)
    return p


def test_sparse_adam_matches_chainer_oracle():
    rng = np.random.RandomState(0)
    p0 = rng.randn(4, 5).astype(np.float32)
    grads = [rng.randn(4, 5).astype(np.float32) for _ in range(5)]
    for g in grads:                       # sprinkle exact zeros
        g[rng.rand(4, 5) < 0.4] = 0.0

    tx = sparse_adam(1e-2)
    params = {"w": jnp.asarray(p0)}
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)

    expect = chainer_adam_oracle(p0, grads, 1e-2)
    np.testing.assert_allclose(np.asarray(params["w"]), expect,
                               rtol=1e-5, atol=1e-6)


def test_zero_grad_elements_untouched():
    p0 = jnp.ones((8,))
    tx = sparse_adam(0.1)
    state = tx.init({"w": p0})
    g = jnp.asarray([0.0, 1.0, 0.0, -2.0, 0.0, 0.0, 3.0, 0.0])
    updates, state = tx.update({"w": g}, state, {"w": p0})
    u = np.asarray(updates["w"])
    assert (u[np.asarray(g) == 0] == 0).all()
    assert (u[np.asarray(g) != 0] != 0).all()
    # moments frozen where grad == 0
    assert (np.asarray(state[0].mu["w"])[np.asarray(g) == 0] == 0).all()


def test_per_parameter_lr_scales():
    rng = np.random.RandomState(1)
    p0 = rng.randn(3, 3).astype(np.float32)
    g = rng.randn(3, 3).astype(np.float32)
    tx = sparse_adam(1e-2, lr_scales={"w": 0.5})
    params = {"w": jnp.asarray(p0)}
    state = tx.init(params)
    updates, _ = tx.update({"w": jnp.asarray(g)}, state, params)
    out = np.asarray(jax.tree_util.tree_map(
        lambda p, u: p + u, params, updates)["w"])
    expect = chainer_adam_oracle(p0, [g], 1e-2, lr_mult=0.5)
    np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-6)


def test_step_count_and_frozen_moments():
    tx = scale_by_sparse_adam()
    p = {"w": jnp.zeros((4,))}
    state = tx.init(p)
    g1 = jnp.asarray([1.0, 0.0, 1.0, 0.0])
    g2 = jnp.asarray([1.0, 1.0, 0.0, 0.0])
    _, state = tx.update({"w": g1}, state, p)
    _, state = tx.update({"w": g2}, state, p)
    # global step count (chainer t), not per-element
    assert int(state.count) == 2
    # element 3 never had a gradient: moments stay zero
    assert float(state.mu["w"][3]) == 0.0
    assert float(state.nu["w"][3]) == 0.0


def test_lr_scales_prefix_tree():
    """A prefix leaf scales its whole subtree (param.lr on a module)."""
    rng = np.random.RandomState(2)
    params = {"enc": {"k": jnp.asarray(rng.randn(2, 2), jnp.float32),
                      "b": jnp.asarray(rng.randn(2), jnp.float32)},
              "dec": {"k": jnp.asarray(rng.randn(2, 2), jnp.float32)}}
    g = jax.tree_util.tree_map(lambda p: jnp.ones_like(p), params)
    tx = sparse_adam(1e-2, lr_scales={"enc": 0.1, "dec": 1.0})
    state = tx.init(params)
    updates, _ = tx.update(g, state, params)
    # identical gradients -> enc updates are exactly 0.1x the dec ones
    np.testing.assert_allclose(np.asarray(updates["enc"]["k"]),
                               0.1 * np.asarray(updates["dec"]["k"]),
                               rtol=1e-6)
