"""VGG19 feature extractor for the perceptual loss.

Re-expression of textural/models/networks.py:467-496 (Vgg19 slices) and
VGGLoss (:137-153): five relu taps with weights 1/32, 1/16, 1/8, 1/4, 1.

ImageNet weights must be ported from a torchvision checkpoint via
utils.port.port_vgg19 (this image has no network access to fetch them);
with random init the loss is still a stable multi-scale feature metric,
but not the paper's perceptual loss — gate with use_vgg_loss=False when
exact parity matters and no checkpoint is available.
"""

from __future__ import annotations

from typing import List

import flax.linen as nn
import jax.numpy as jnp

# torchvision vgg19.features conv layout (channels per conv, M = maxpool)
_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
        512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]
# relu tap points after features[x] for x in (2, 7, 12, 21, 30):
# relu1_1, relu2_1, relu3_1, relu4_1, relu5_1 (networks.py:476-486).
_TAPS = (0, 2, 4, 8, 12)      # conv indices whose relu output is tapped
LOSS_WEIGHTS = (1.0 / 32, 1.0 / 16, 1.0 / 8, 1.0 / 4, 1.0)


class Vgg19Features(nn.Module):
    """Returns the 5 relu feature taps. Input NHWC in [-1, 1] (pix2pixHD
    feeds tanh outputs / normalized images directly)."""

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        taps = []
        conv_idx = 0
        for c in _CFG:
            if c == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.relu(nn.Conv(c, (3, 3), padding=[(1, 1), (1, 1)],
                                    name=f"conv{conv_idx}")(x))
                if conv_idx in _TAPS:
                    taps.append(x)
                conv_idx += 1
            if len(taps) == len(_TAPS) and conv_idx > _TAPS[-1]:
                break
        return taps


def vgg_loss(vgg_variables, fake: jnp.ndarray, real: jnp.ndarray
             ) -> jnp.ndarray:
    """VGGLoss (networks.py:137-153): weighted L1 over the 5 taps.
    fake/real NHWC."""
    import jax

    model = Vgg19Features()
    f_fake = model.apply(vgg_variables, fake)
    f_real = model.apply(vgg_variables, real)
    loss = 0.0
    for w, a, b in zip(LOSS_WEIGHTS, f_fake, f_real):
        loss = loss + w * jnp.mean(jnp.abs(a - jax.lax.stop_gradient(b)))
    return loss
