"""LPIPS perceptual distance (Zhang et al. 2018), VGG16 variant.

BASELINE.md names "LPIPS/L1 parity" as the benchmark metric; the reference
repo never computes LPIPS itself (paper-only, README.md:212), so this is
the rebuild's own implementation of the standard metric:

  d(x, y) = sum_l  mean_hw  || w_l ⊙ (norm(f_l(x)) - norm(f_l(y))) ||^2

with f_l the 5 VGG16 relu taps (relu1_2, relu2_2, relu3_3, relu4_3,
relu5_3), norm() channel-unit-normalization, and w_l >= 0 the learned
per-channel linear weights of the official `lpips` checkpoints.

Weights must be ported from the official torch checkpoint
(utils.port.port_lpips — this image has no egress to fetch them); with
random/ones init the metric is still a deterministic multi-scale
perceptual distance, just not calibrated to human judgments.  Math is
pinned by a numpy-oracle test (tests/test_metrics.py).
"""

from __future__ import annotations

from typing import Any, List

import flax.linen as nn
import jax
import jax.numpy as jnp

# torchvision vgg16.features conv layout
_CFG16 = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
          512, 512, 512, "M", 512, 512, 512]
# conv indices whose relu output is tapped: relu{1_2,2_2,3_3,4_3,5_3}
_TAPS16 = (1, 3, 6, 9, 12)
TAP_CHANNELS = (64, 128, 256, 512, 512)

# input scaling layer of the official implementation
_SHIFT = (-0.030, -0.088, -0.188)
_SCALE = (0.458, 0.448, 0.450)


class Vgg16Features(nn.Module):
    """The 5 LPIPS relu taps of VGG16.  Input NHWC in [-1, 1]."""

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        x = (x - jnp.asarray(_SHIFT, x.dtype)) / jnp.asarray(_SCALE, x.dtype)
        taps = []
        conv_idx = 0
        for c in _CFG16:
            if c == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.relu(nn.Conv(c, (3, 3), padding=[(1, 1), (1, 1)],
                                    name=f"conv{conv_idx}")(x))
                if conv_idx in _TAPS16:
                    taps.append(x)
                conv_idx += 1
        return taps


class LPIPS(nn.Module):
    """Full LPIPS head: backbone taps -> unit-norm -> per-channel linear
    weights -> spatial mean -> sum over layers.  Returns [B]."""

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        net = Vgg16Features(name="net")
        fx = net(x)
        fy = net(y)
        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            a = _unit_normalize(a)
            b = _unit_normalize(b)
            diff = (a - b) ** 2
            # the official lin heads are 1x1 convs with non-negative weights
            w = self.param(f"lin{i}", nn.initializers.ones,
                           (diff.shape[-1],))
            total = total + jnp.mean(
                jnp.sum(diff * jnp.abs(w), axis=-1), axis=(1, 2))
        return total


def _unit_normalize(t: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    norm = jnp.sqrt(jnp.sum(t ** 2, axis=-1, keepdims=True))
    return t / (norm + eps)


def init_lpips(rng: jax.Array | None = None) -> Any:
    """Initialize LPIPS variables (random backbone unless ported)."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    model = LPIPS()
    return model.init(rng, jnp.zeros((1, 64, 64, 3)),
                      jnp.zeros((1, 64, 64, 3)))


_lpips_apply = jax.jit(lambda variables, x, y: LPIPS().apply(variables, x, y))


def lpips(variables: Any, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """LPIPS distance per batch item; x, y NHWC in [-1, 1]."""
    return _lpips_apply(variables, x, y)
