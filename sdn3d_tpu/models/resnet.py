"""ResNet family (flax.linen), shared by all three branches.

Covers the reference's three backbones with one implementation:
  * torchvision resnet18 — derenderer encoder (derender3d/models/derenderer.py:28)
  * dilated resnet50 (output stride 8) + deep 3-conv stem — semantic encoder
    (semantic/resnet.py:104-132, semantic/models.py:183-247)
  * resnet101 C1-C5 feature pyramid — Mask R-CNN bottom-up
    (geometric/maskrcnn/model.py:249-305)

BatchNorm note: under pjit with the batch axis sharded across the device
mesh, flax BatchNorm's jnp.mean reductions are global — cross-device
synchronized BN falls out of the SPMD partitioner for free, replacing the
reference's thread-pipe SyncBN machinery (semantic/lib/nn/modules/batchnorm.py).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

ModuleDef = Any


class BasicBlock(nn.Module):
    filters: int
    stride: int = 1
    dilation: int = 1
    norm: ModuleDef = nn.BatchNorm
    expansion: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(self.filters, (3, 3), strides=(self.stride,) * 2,
                    padding=[(self.dilation,) * 2] * 2,
                    kernel_dilation=(self.dilation,) * 2, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        y = self.norm(name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), padding=[(self.dilation,) * 2] * 2,
                    kernel_dilation=(self.dilation,) * 2, use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = self.norm(name="bn2")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.filters, (1, 1),
                               strides=(self.stride,) * 2, use_bias=False,
                               dtype=self.dtype, name="downsample_conv")(x)
            residual = self.norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    filters: int
    stride: int = 1
    dilation: int = 1
    norm: ModuleDef = nn.BatchNorm
    expansion: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(self.filters, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = self.norm(name="bn1")(y)
        y = nn.relu(y)
        # torchvision-style "B": stride on the 3x3.
        y = nn.Conv(self.filters, (3, 3), strides=(self.stride,) * 2,
                    padding=[(self.dilation,) * 2] * 2,
                    kernel_dilation=(self.dilation,) * 2, use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = self.norm(name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters * 4, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(y)
        y = self.norm(name="bn3")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.filters * 4, (1, 1),
                               strides=(self.stride,) * 2, use_bias=False,
                               dtype=self.dtype, name="downsample_conv")(x)
            residual = self.norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """Configurable ResNet trunk returning per-stage features (C1..C5).

    stage_sizes: blocks per stage, e.g. (2, 2, 2, 2) for resnet18.
    output_stride: 32 (standard) or 8 (layer3/4 strides become dilations —
    semantic/models.py:213-226 `_nostride_dilate`).
    deep_stem: 3x conv3x3 stem with 128 output channels
    (semantic/resnet.py:104-132) instead of the 7x7 torchvision stem.
    """

    stage_sizes: Sequence[int]
    block_cls: ModuleDef = BasicBlock
    output_stride: int = 32
    deep_stem: bool = False
    norm_momentum: float = 0.9
    norm_eps: float = 1e-5
    # Computation dtype for convs/dense (params stay float32); BatchNorm
    # always reduces in float32 for stable statistics.  bfloat16 measured
    # 5.5x faster than float32 for a conv stack on v5e.
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False
                 ) -> Tuple[jnp.ndarray, ...]:
        norm = lambda name=None: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=self.norm_momentum,
            epsilon=self.norm_eps, dtype=jnp.float32, name=name)

        if self.deep_stem:
            x = nn.Conv(64, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                        use_bias=False, dtype=self.dtype, name="conv1")(x)
            x = nn.relu(norm("bn1")(x))
            x = nn.Conv(64, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                        dtype=self.dtype, name="conv2")(x)
            x = nn.relu(norm("bn2")(x))
            x = nn.Conv(128, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                        dtype=self.dtype, name="conv3")(x)
            x = nn.relu(norm("bn3")(x))
        else:
            x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                        use_bias=False, dtype=self.dtype, name="conv1")(x)
            x = nn.relu(norm("bn1")(x))
        c1 = x
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        features = [c1]
        num_filters = (64, 128, 256, 512)
        strides = [1, 2, 2, 2]
        dilations = [1, 1, 1, 1]
        first_dilations = [1, 1, 1, 1]
        if self.output_stride == 8:
            # _nostride_dilate (semantic/models.py:213-226): strided convs
            # become stride 1 with dilation//2; the rest get the full
            # dilation.
            strides = [1, 2, 1, 1]
            dilations = [1, 1, 2, 4]
            first_dilations = [1, 1, 1, 2]
        for i, (blocks, f) in enumerate(zip(self.stage_sizes, num_filters)):
            for j in range(blocks):
                x = self.block_cls(
                    filters=f,
                    stride=strides[i] if j == 0 else 1,
                    dilation=first_dilations[i] if j == 0 else dilations[i],
                    norm=norm,
                    dtype=self.dtype,
                    name=f"layer{i + 1}_{j}")(x)
            features.append(x)
        return tuple(features)  # (C1, C2, C3, C4, C5)


class ResNetClassifier(nn.Module):
    """ResNet trunk + global average pool + fc (torchvision resnet18 shape)."""

    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    block_cls: ModuleDef = BasicBlock
    num_outputs: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = ResNet(self.stage_sizes, self.block_cls, dtype=self.dtype,
                       name="trunk")(x, train=train)
        x = feats[-1].mean(axis=(1, 2))                 # adaptive avgpool -> 1
        return nn.Dense(self.num_outputs, dtype=self.dtype,
                        name="fc")(x).astype(jnp.float32)


def resnet18_feature(num_outputs: int = 256) -> ResNetClassifier:
    return ResNetClassifier(stage_sizes=(2, 2, 2, 2), block_cls=BasicBlock,
                            num_outputs=num_outputs)


def resnet50_dilated8() -> ResNet:
    return ResNet(stage_sizes=(3, 4, 6, 3), block_cls=Bottleneck,
                  output_stride=8, deep_stem=True)


def resnet101() -> ResNet:
    return ResNet(stage_sizes=(3, 4, 23, 3), block_cls=Bottleneck)
