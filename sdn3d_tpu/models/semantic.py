"""Semantic branch: dilated ResNet-50 encoder + Pyramid Pooling decoder.

Re-expression of semantic/models.py (encoder resnet50_dilated8 with the deep
3-conv stem of semantic/resnet.py:104-132, decoder ppm_bilinear_deepsup
models.py:359-415 — the default architecture, semantic/vkitti_train.py:190-193).

Bilinear resizes use half-pixel (align_corners=False) semantics via
jax.image.resize.  The adaptive average pooling of the PPM is expressed as
two averaging matmuls (rows then cols) so it runs on the MXU instead of a
gather loop.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from sdn3d_tpu.models.resnet import ResNet, Bottleneck


def _adaptive_pool_matrix(in_size: int, out_size: int) -> np.ndarray:
    """[out, in] averaging matrix with torch AdaptiveAvgPool2d windows."""
    A = np.zeros((out_size, in_size), np.float32)
    for i in range(out_size):
        start = (i * in_size) // out_size
        end = -(-((i + 1) * in_size) // out_size)  # ceil
        A[i, start:end] = 1.0 / (end - start)
    return A


def adaptive_avg_pool2d(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """x [B, H, W, C] -> [B, oh, ow, C] (torch AdaptiveAvgPool2d semantics)."""
    H, W = x.shape[1], x.shape[2]
    A = jnp.asarray(_adaptive_pool_matrix(H, out_hw[0])).astype(x.dtype)
    Bm = jnp.asarray(_adaptive_pool_matrix(W, out_hw[1])).astype(x.dtype)
    x = jnp.einsum("oh,bhwc->bowc", A, x)
    return jnp.einsum("pw,bowc->bopc", Bm, x)


def resize_bilinear(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """[B, H, W, C] bilinear resize (half-pixel centers)."""
    return jax.image.resize(
        x, (x.shape[0], out_hw[0], out_hw[1], x.shape[3]), method="bilinear")


class ConvBNReLU(nn.Module):
    filters: int
    kernel: int = 3
    use_running_average: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = self.kernel // 2
        x = nn.Conv(self.filters, (self.kernel,) * 2,
                    padding=[(p, p), (p, p)], use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=self.use_running_average,
                         momentum=0.9, epsilon=1e-5, dtype=jnp.float32,
                         name="bn")(x)
        return nn.relu(x)


class PPMDeepsup(nn.Module):
    """PPMBilinearDeepsup (semantic/models.py:359-415)."""

    num_class: int = 14
    fc_dim: int = 2048
    pool_scales: Sequence[int] = (1, 2, 3, 6)
    dropout_rate: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, conv_out, seg_size: Optional[Tuple[int, int]] = None,
                 train: bool = False, rngs=None):
        conv5 = conv_out[-1]
        hw = (conv5.shape[1], conv5.shape[2])

        ppm_out = [conv5]
        for k, scale in enumerate(self.pool_scales):
            y = adaptive_avg_pool2d(conv5, (scale, scale))
            y = nn.Conv(512, (1, 1), use_bias=False, dtype=self.dtype,
                        name=f"ppm{k}_conv")(y)
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.float32,
                             name=f"ppm{k}_bn")(y)
            y = nn.relu(y)
            ppm_out.append(resize_bilinear(y, hw))
        x = jnp.concatenate(ppm_out, axis=-1)

        x = nn.Conv(512, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                    dtype=self.dtype, name="conv_last0")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32,
                         name="conv_last_bn")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = nn.Conv(self.num_class, (1, 1), dtype=self.dtype,
                    name="conv_last1")(x).astype(jnp.float32)

        if seg_size is not None:  # inference
            x = resize_bilinear(x, seg_size)
            return jax.nn.softmax(x, axis=-1)

        # deep supervision head from conv4 (models.py:404-408)
        conv4 = conv_out[-2]
        d = ConvBNReLU(self.fc_dim // 4, 3, use_running_average=not train,
                       dtype=self.dtype, name="cbr_deepsup")(conv4)
        d = nn.Dropout(self.dropout_rate, deterministic=not train)(d)
        d = nn.Conv(self.num_class, (1, 1), dtype=self.dtype,
                    name="conv_last_deepsup")(d).astype(jnp.float32)

        return (jax.nn.log_softmax(x, axis=-1), jax.nn.log_softmax(d, axis=-1))


class C1BilinearDeepSup(nn.Module):
    """conv3x3-bn-relu + 1x1 classifier decoder with deep supervision
    (semantic/models.py:251-283); C1Bilinear == seg_size-only use."""

    num_class: int = 14
    fc_dim: int = 2048
    deep_sup: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, conv_out, seg_size: Optional[Tuple[int, int]] = None,
                 train: bool = False):
        conv5 = conv_out[-1]
        x = ConvBNReLU(self.fc_dim // 4, 3, use_running_average=not train,
                       dtype=self.dtype, name="cbr")(conv5)
        x = nn.Conv(self.num_class, (1, 1), dtype=self.dtype,
                    name="conv_last")(x).astype(jnp.float32)

        if seg_size is not None:  # inference
            x = resize_bilinear(x, seg_size)
            return jax.nn.softmax(x, axis=-1)
        if not self.deep_sup:
            return jax.nn.log_softmax(x, axis=-1)

        conv4 = conv_out[-2]
        d = ConvBNReLU(self.fc_dim // 4, 3, use_running_average=not train,
                       dtype=self.dtype, name="cbr_deepsup")(conv4)
        d = nn.Conv(self.num_class, (1, 1), dtype=self.dtype,
                    name="conv_last_deepsup")(d).astype(jnp.float32)
        return (jax.nn.log_softmax(x, axis=-1), jax.nn.log_softmax(d, axis=-1))


class PPMBilinear(nn.Module):
    """Pyramid pooling decoder WITHOUT deep supervision
    (semantic/models.py:311-355)."""

    num_class: int = 14
    pool_scales: Sequence[int] = (1, 2, 3, 6)
    dropout_rate: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, conv_out, seg_size: Optional[Tuple[int, int]] = None,
                 train: bool = False):
        conv5 = conv_out[-1]
        hw = (conv5.shape[1], conv5.shape[2])
        ppm_out = [conv5]
        for k, scale in enumerate(self.pool_scales):
            y = adaptive_avg_pool2d(conv5, (scale, scale))
            y = nn.Conv(512, (1, 1), use_bias=False, dtype=self.dtype,
                        name=f"ppm{k}_conv")(y)
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.float32,
                             name=f"ppm{k}_bn")(y)
            y = nn.relu(y)
            ppm_out.append(resize_bilinear(y, hw))
        x = jnp.concatenate(ppm_out, axis=-1)
        x = nn.Conv(512, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                    dtype=self.dtype, name="conv_last0")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32,
                         name="conv_last_bn")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = nn.Conv(self.num_class, (1, 1), dtype=self.dtype,
                    name="conv_last1")(x).astype(jnp.float32)
        if seg_size is not None:
            x = resize_bilinear(x, seg_size)
            return jax.nn.softmax(x, axis=-1)
        return jax.nn.log_softmax(x, axis=-1)


DECODERS = {
    "ppm_bilinear_deepsup": PPMDeepsup,
    "ppm_bilinear": PPMBilinear,
    "c1_bilinear_deepsup": C1BilinearDeepSup,
    "c1_bilinear": lambda **kw: C1BilinearDeepSup(deep_sup=False, **kw),
}


class SemanticModel(nn.Module):
    """Encoder + decoder; forward semantics of SegmentationModule
    (semantic/models.py:24-48).  Images are NHWC.

    arch_decoder selects among the reference's decoders
    (ModelBuilder.build_decoder, models.py:117-147); the 3D-SDN default is
    ppm_bilinear_deepsup (vkitti_train.py:190-193)."""

    num_class: int = 14
    deep_sup_scale: float = 0.4
    arch_decoder: str = "ppm_bilinear_deepsup"
    # bfloat16 runs the conv stacks ~5x faster on v5e; logits/losses and
    # all BatchNorm statistics stay float32.
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images, seg_size: Optional[Tuple[int, int]] = None,
                 train: bool = False):
        feats = ResNet(stage_sizes=(3, 4, 6, 3), block_cls=Bottleneck,
                       output_stride=8, deep_stem=True, dtype=self.dtype,
                       name="encoder")(images, train=train)
        conv_out = feats[1:]  # C2..C5
        decoder = DECODERS[self.arch_decoder](num_class=self.num_class,
                                              dtype=self.dtype,
                                              name="decoder")
        return decoder(conv_out, seg_size=seg_size, train=train)


def segmentation_loss(log_probs: jnp.ndarray, labels: jnp.ndarray,
                      ignore_index: int = -1) -> jnp.ndarray:
    """NLLLoss with ignore_index (semantic/vkitti_train.py crit).

    log_probs [B, H, W, C]; labels [B, H, W] int (-1 = ignore)."""
    valid = labels != ignore_index
    labels_c = jnp.where(valid, labels, 0)
    nll = -jnp.take_along_axis(log_probs, labels_c[..., None],
                               axis=-1)[..., 0]
    return jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1)


def pixel_accuracy(log_probs: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """semantic/models.py:15-21."""
    preds = jnp.argmax(log_probs, axis=-1)
    valid = labels >= 0
    return jnp.sum(valid & (preds == labels)) / (jnp.sum(valid) + 1e-10)
