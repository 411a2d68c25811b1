"""Sparse-aware Adam (NR-9 equivalent).

The reference ships a custom chainer Adam rule
(geometric/neural_renderer/optimizers.py:9-39) with two behaviors:

1. a weight element whose gradient is exactly zero is NOT updated — its
   Adam moments are frozen and the parameter is left untouched (the cupy
   kernel guards the whole update on ``grad != 0``);
2. a per-parameter learning-rate multiplier (``param.lr``).

It is unused by any 3D-SDN entry point (SURVEY.md §2.1), but it is part
of the reference's public surface, so the TPU rebuild carries the same
capability as an optax gradient transformation.  On TPU the elementwise
``where`` fuses into the update — no gather/scatter machinery needed.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


class SparseAdamState(NamedTuple):
    count: jnp.ndarray   # scalar int32 step count (chainer's global t)
    mu: Any
    nu: Any


def scale_by_sparse_adam(b1: float = 0.9, b2: float = 0.999,
                         eps: float = 1e-8) -> optax.GradientTransformation:
    """Adam moment scaling that skips zero-gradient elements.

    Matches the reference kernel elementwise: where ``grad == 0`` the
    moments and the outgoing update are both zero (parameter untouched);
    elsewhere the chainer ``m += (1-b1)(g-m)`` / ``v += (1-b2)(g²-v)``
    recurrences apply.  The kernel's ``lr`` input is chainer AdamRule's
    bias-corrected property ``alpha·sqrt(1-b2^t)/(1-b1^t)`` where ``t``
    is the GLOBAL step count (incremented once per update call, not per
    element) — the ``alpha_t`` factor is applied here so the chained
    learning rate stays plain alpha.
    """

    def init_fn(params):
        zeros = lambda p: jnp.zeros_like(p)
        return SparseAdamState(
            count=jnp.zeros((), jnp.int32),
            mu=jax.tree_util.tree_map(zeros, params),
            nu=jax.tree_util.tree_map(zeros, params),
        )

    def update_fn(updates, state, params=None):
        del params
        t = state.count + 1
        tf = t.astype(jnp.float32)
        alpha_t = jnp.sqrt(1.0 - b2 ** tf) / (1.0 - b1 ** tf)

        def upd(g, m, v):
            live = g != 0
            m2 = jnp.where(live, m + (1 - b1) * (g - m), m)
            v2 = jnp.where(live, jnp.maximum(v + (1 - b2) * (g * g - v), 0),
                           v)
            step = jnp.where(live, alpha_t * m2 / (jnp.sqrt(v2) + eps),
                             jnp.zeros_like(m2))
            return step, m2, v2

        flat = jax.tree_util.tree_map(upd, updates, state.mu, state.nu)
        pick = lambda i: jax.tree_util.tree_map(
            lambda t_: t_[i], flat, is_leaf=lambda t_: isinstance(t_, tuple))
        return pick(0), SparseAdamState(count=t, mu=pick(1), nu=pick(2))

    return optax.GradientTransformation(init_fn, update_fn)


def sparse_adam(learning_rate, b1: float = 0.9, b2: float = 0.999,
                eps: float = 1e-8,
                lr_scales: Optional[Any] = None
                ) -> optax.GradientTransformation:
    """NR-9-equivalent optimizer: sparse Adam with optional per-parameter
    learning-rate multipliers (``param.lr`` in the reference; here a
    pytree prefix of scalars — each prefix leaf scales its whole params
    subtree, or an exact-structure tree of scalars)."""
    chain = [scale_by_sparse_adam(b1, b2, eps)]
    if lr_scales is not None:
        def scale_leaves(updates, state, params=None):
            del params
            # prefix broadcasting: each lr_scales leaf applies to the
            # corresponding updates SUBTREE (flatten_up_to aligns them)
            prefix_def = jax.tree_util.tree_structure(lr_scales)
            subtrees = prefix_def.flatten_up_to(updates)
            scales = jax.tree_util.tree_leaves(lr_scales)
            scaled = [jax.tree_util.tree_map(lambda u, s=s: u * s, sub)
                      for s, sub in zip(scales, subtrees)]
            return jax.tree_util.tree_unflatten(prefix_def, scaled), state
        chain.append(optax.GradientTransformation(
            lambda params: optax.EmptyState(), scale_leaves))
    chain.append(optax.scale_by_learning_rate(learning_rate))
    return optax.chain(*chain)
