"""GAN history buffer (textural/util/image_pool.py:6-32).

Host-side: stores previously generated conditioning+fake stacks and, with
probability 0.5, swaps the current fake for a historical one.  The 3D-SDN
config uses pool_size=0 (train_options.py:35), where this is a pass-through
— provided for full pix2pixHD parity.
"""

from __future__ import annotations

import flax
import jax
import jax.numpy as jnp
import numpy as np


class ImagePool:
    def __init__(self, pool_size: int, seed: int = 0):
        self.pool_size = pool_size
        self.images = []
        self.rng = np.random.RandomState(seed)

    def query(self, images: np.ndarray) -> np.ndarray:
        """images [B, ...] -> same-shaped batch, possibly from history."""
        if self.pool_size == 0:
            return images
        out = []
        for img in images:
            if len(self.images) < self.pool_size:
                self.images.append(img.copy())
                out.append(img)
            elif self.rng.rand() > 0.5:
                idx = self.rng.randint(len(self.images))
                out.append(self.images[idx].copy())
                self.images[idx] = img.copy()
            else:
                out.append(img)
        return np.stack(out)


@flax.struct.dataclass
class DeviceImagePool:
    """Device-resident GAN history buffer — ImagePool.query semantics
    (util/image_pool.py:6-32) expressed as a jit-traceable pytree so the
    pool update can live INSIDE the fused train iteration instead of
    round-tripping the [B, H, W, C] fake-concat through the host (the
    r4 bench paid ~17 MB of relay transfer + a sync per iteration for a
    pass-through pool; VERDICT r4 item 4).

    Per-sample sequential semantics match the host pool exactly: while
    the buffer is filling, append and return the input; once full, with
    p=0.5 return (and replace) a uniformly-drawn historical entry, else
    return the input.  Decisions are drawn from a jax PRNG key rather
    than the host pool's numpy RandomState — same distribution,
    different stream (the pool is stochastic by contract; the reference
    default pool_size=0 bypasses it entirely, train_options.py:35)."""

    buf: jnp.ndarray                    # [pool_size, H, W, C]
    n: jnp.ndarray                      # int32 fill count
    pool_size: int = flax.struct.field(pytree_node=False, default=0)

    @classmethod
    def create(cls, pool_size: int, shape, dtype=jnp.float32
               ) -> "DeviceImagePool":
        return cls(buf=jnp.zeros((pool_size,) + tuple(shape), dtype),
                   n=jnp.zeros((), jnp.int32), pool_size=pool_size)

    def query(self, images: jnp.ndarray, key: jax.Array
              ) -> tuple[jnp.ndarray, "DeviceImagePool"]:
        """images [B, ...] -> (same-shaped batch, updated pool)."""
        if self.pool_size == 0:
            return images, self

        P = self.pool_size

        def body(carry, x):
            buf, n = carry
            img, k = x
            k1, k2 = jax.random.split(k)
            not_full = n < P
            use_hist = jax.random.uniform(k1) > 0.5
            idx_hist = jax.random.randint(k2, (), 0, jnp.maximum(n, 1))
            widx = jnp.where(not_full, n, idx_hist)
            old = jax.lax.dynamic_index_in_dim(buf, widx, 0,
                                               keepdims=False)
            out = jnp.where(not_full | ~use_hist, img, old)
            # append (filling) / swap (full & use_hist) / no-op write
            new_row = jnp.where(not_full | use_hist, img, old)
            buf = jax.lax.dynamic_update_index_in_dim(buf, new_row,
                                                      widx, 0)
            return (buf, n + not_full.astype(n.dtype)), out

        keys = jax.random.split(key, images.shape[0])
        (buf, n), outs = jax.lax.scan(
            body, (self.buf, self.n),
            (images.astype(self.buf.dtype), keys))
        return outs.astype(images.dtype), \
            self.replace(buf=buf, n=n)
