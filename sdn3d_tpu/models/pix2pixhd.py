"""Textural branch networks: pix2pixHD-style G / multiscale D / instance
feature encoder E.

Re-expression of textural/models/networks.py.  Norm layers are instance norm
without affine params (pix2pixHD default).  The reference's per-instance
average-pooling python loop (networks.py:310-326) becomes a segment_sum over
dense instance slots — one fused scatter instead of a host loop.

3D-SDN settings (textural/options/base_options.py): ngf=64,
n_downsample_global=4, n_blocks_global=9, n_local_enhancers=0 (LocalEnhancer
unused), ndf=64, num_D=2, n_layers_D=3, getIntermFeat=True, nef=16,
n_downsample_E=4, feat_num=5.
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """InstanceNorm2d(affine=False) on NHWC; statistics always float32."""
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=(1, 2), keepdims=True)
    var = xf.var(axis=(1, 2), keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def reflect_pad(x: jnp.ndarray, p: int) -> jnp.ndarray:
    return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")


def avg_pool_3s2_nopad_count(x: jnp.ndarray) -> jnp.ndarray:
    """AvgPool2d(3, stride=2, padding=1, count_include_pad=False)
    (networks.py:383) for the multiscale pyramids."""
    ones = jnp.ones_like(x[..., :1])
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 3, 3, 1),
                              (1, 2, 2, 1), [(0, 0), (1, 1), (1, 1), (0, 0)])
    c = jax.lax.reduce_window(ones, 0.0, jax.lax.add, (1, 3, 3, 1),
                              (1, 2, 2, 1), [(0, 0), (1, 1), (1, 1), (0, 0)])
    return s / c


class ResnetBlockG(nn.Module):
    """Generator residual block, reflect padding (networks.py:245-283)."""
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = reflect_pad(x, 1)
        y = nn.Conv(self.dim, (3, 3), padding="VALID", dtype=self.dtype, name="conv1")(y)
        y = nn.relu(instance_norm(y))
        y = reflect_pad(y, 1)
        y = nn.Conv(self.dim, (3, 3), padding="VALID", dtype=self.dtype, name="conv2")(y)
        y = instance_norm(y)
        return x + y


class GlobalGenerator(nn.Module):
    """c7s1-ngf, n_downsampling stride-2 convs, n_blocks resblocks,
    mirrored deconvs, c7s1-3 + tanh (networks.py:211-242).

    skip_final=True returns the pre-output feature map (the reference's
    LocalEnhancer drops the global generator's final 3 modules,
    networks.py:164-166)."""
    output_nc: int = 3
    ngf: int = 64
    n_downsampling: int = 4
    n_blocks: int = 9
    skip_final: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = reflect_pad(x, 3)
        y = nn.Conv(self.ngf, (7, 7), padding="VALID", dtype=self.dtype, name="conv_in")(y)
        y = nn.relu(instance_norm(y))
        for i in range(self.n_downsampling):
            mult = 2 ** i
            y = nn.Conv(self.ngf * mult * 2, (3, 3), strides=(2, 2),
                        padding=[(1, 1), (1, 1)], dtype=self.dtype, name=f"down{i}")(y)
            y = nn.relu(instance_norm(y))
        mult = 2 ** self.n_downsampling
        for i in range(self.n_blocks):
            y = ResnetBlockG(self.ngf * mult, dtype=self.dtype, name=f"res{i}")(y)
        for i in range(self.n_downsampling):
            mult = 2 ** (self.n_downsampling - i)
            # torch ConvTranspose2d(3, stride 2, pad 1, output_pad 1)
            # == lax.conv_transpose(transpose_kernel=True, padding (1, 2)).
            y = nn.ConvTranspose(self.ngf * mult // 2, (3, 3), strides=(2, 2),
                                 padding=((1, 2), (1, 2)),
                                 transpose_kernel=True, dtype=self.dtype, name=f"up{i}")(y)
            y = nn.relu(instance_norm(y))
        if self.skip_final:
            return y
        y = reflect_pad(y, 3)
        y = nn.Conv(self.output_nc, (7, 7), padding="VALID",
                    dtype=self.dtype, name="conv_out")(y)
        return jnp.tanh(y.astype(jnp.float32))


class LocalEnhancer(nn.Module):
    """Coarse-to-fine generator (networks.py:156-208): a GlobalGenerator
    trunk on the n-times-downsampled input plus per-level enhancer branches
    whose downsampled features are summed with the coarser level's output.
    Unused by the 3D-SDN default config (n_local_enhancers=0,
    options/base_options.py:61) but part of the pix2pixHD surface."""
    output_nc: int = 3
    ngf: int = 32
    n_downsample_global: int = 3
    n_blocks_global: int = 9
    n_local_enhancers: int = 1
    n_blocks_local: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        pyramid = [x]
        for _ in range(self.n_local_enhancers):
            pyramid.append(avg_pool_3s2_nopad_count(pyramid[-1]))

        out = GlobalGenerator(
            self.output_nc, self.ngf * 2 ** self.n_local_enhancers,
            self.n_downsample_global, self.n_blocks_global,
            skip_final=True, dtype=self.dtype, name="global")(pyramid[-1])

        for n in range(1, self.n_local_enhancers + 1):
            ngf_g = self.ngf * 2 ** (self.n_local_enhancers - n)
            xi = pyramid[self.n_local_enhancers - n]
            y = reflect_pad(xi, 3)
            y = nn.Conv(ngf_g, (7, 7), padding="VALID",
                        dtype=self.dtype, name=f"enh{n}_conv_in")(y)
            y = nn.relu(instance_norm(y))
            y = nn.Conv(ngf_g * 2, (3, 3), strides=(2, 2),
                        padding=[(1, 1), (1, 1)], dtype=self.dtype, name=f"enh{n}_down")(y)
            y = nn.relu(instance_norm(y))
            y = y + out
            for i in range(self.n_blocks_local):
                y = ResnetBlockG(ngf_g * 2, dtype=self.dtype,
                                 name=f"enh{n}_res{i}")(y)
            y = nn.ConvTranspose(ngf_g, (3, 3), strides=(2, 2),
                                 padding=((1, 2), (1, 2)),
                                 transpose_kernel=True,
                                 dtype=self.dtype, name=f"enh{n}_up")(y)
            y = nn.relu(instance_norm(y))
            if n == self.n_local_enhancers:
                y = reflect_pad(y, 3)
                y = nn.Conv(self.output_nc, (7, 7), padding="VALID",
                            dtype=self.dtype, name="conv_out")(y)
                y = jnp.tanh(y)
            out = y
        return out


class NLayerDiscriminator(nn.Module):
    """3-layer PatchGAN returning intermediate features
    (networks.py:412-464)."""
    ndf: int = 64
    n_layers: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        feats = []
        y = nn.Conv(self.ndf, (4, 4), strides=(2, 2),
                    padding=[(2, 2), (2, 2)], dtype=self.dtype, name="conv0")(x)
        y = nn.leaky_relu(y, 0.2)
        feats.append(y)
        nf = self.ndf
        for n in range(1, self.n_layers):
            nf = min(nf * 2, 512)
            y = nn.Conv(nf, (4, 4), strides=(2, 2),
                        padding=[(2, 2), (2, 2)], dtype=self.dtype,
                        name=f"conv{n}")(y)
            y = nn.leaky_relu(instance_norm(y), 0.2)
            feats.append(y)
        nf = min(nf * 2, 512)
        y = nn.Conv(nf, (4, 4), padding=[(2, 2), (2, 2)],
                    dtype=self.dtype, name=f"conv{self.n_layers}")(y)
        y = nn.leaky_relu(instance_norm(y), 0.2)
        feats.append(y)
        y = nn.Conv(1, (4, 4), padding=[(2, 2), (2, 2)],
                    dtype=self.dtype,
                    name=f"conv{self.n_layers + 1}")(y)
        y = y.astype(jnp.float32)
        feats.append(y)
        return feats


class MultiscaleDiscriminator(nn.Module):
    """num_D patch discriminators on an avg-pool pyramid
    (networks.py:368-409).  Returns list (coarse..fine? reference order:
    result[i] uses layer (num_D-1-i) on the i-times-downsampled input)."""
    ndf: int = 64
    n_layers: int = 3
    num_D: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> List[List[jnp.ndarray]]:
        results = []
        cur = x
        for i in range(self.num_D):
            d = NLayerDiscriminator(self.ndf, self.n_layers,
                                    dtype=self.dtype,
                                    name=f"scale{self.num_D - 1 - i}")
            results.append(d(cur))
            if i != self.num_D - 1:
                cur = avg_pool_3s2_nopad_count(cur)
        return results


class Encoder(nn.Module):
    """Instance-wise feature encoder (networks.py:286-346)."""
    feat_num: int = 5
    nef: int = 16
    n_downsampling: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = reflect_pad(x, 3)
        y = nn.Conv(self.nef, (7, 7), padding="VALID", dtype=self.dtype, name="conv_in")(y)
        y = nn.relu(instance_norm(y))
        for i in range(self.n_downsampling):
            mult = 2 ** i
            y = nn.Conv(self.nef * mult * 2, (3, 3), strides=(2, 2),
                        padding=[(1, 1), (1, 1)], dtype=self.dtype, name=f"down{i}")(y)
            y = nn.relu(instance_norm(y))
        for i in range(self.n_downsampling):
            mult = 2 ** (self.n_downsampling - i)
            y = nn.ConvTranspose(self.nef * mult // 2, (3, 3), strides=(2, 2),
                                 padding=((1, 2), (1, 2)),
                                 transpose_kernel=True, dtype=self.dtype, name=f"up{i}")(y)
            y = nn.relu(instance_norm(y))
        y = reflect_pad(y, 3)
        y = nn.Conv(self.feat_num, (7, 7), padding="VALID",
                    dtype=self.dtype, name="conv_out")(y)
        return jnp.tanh(y.astype(jnp.float32))


class GlobalEncoder(nn.Module):
    """Global VAE encoder (netGlobalE): image -> (mu, logvar) of an
    nz-dim latent whose reparameterized sample is broadcast over H x W as
    extra netG conditioning channels (pix2pixHD_model.py:190-198,265-271).

    The reference configures it as `global_encoder_which_model='resnet_128'`
    with nef=64, nz=3 (base_options.py:65-68) but never constructs the
    module (no `self.netGlobalE = ...` exists; the path is dead code unless
    loaded from a checkpoint).  We therefore implement the named
    convention — a BicycleGAN-style resnet encoder: stride-2 residual
    downsampling stack, global average pool, two Dense heads — rather than
    translate an architecture that does not exist in the reference.
    """
    nz: int = 3
    nef: int = 64
    n_blocks: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
        y = nn.Conv(self.nef, (4, 4), strides=(2, 2),
                    padding=[(1, 1), (1, 1)], dtype=self.dtype,
                    name="conv_in")(x)
        ch = self.nef
        for i in range(self.n_blocks):
            out_ch = self.nef * min(2 ** (i + 1), 4)
            # pre-activation residual block, stride-2 via avg-pool shortcut
            h = nn.relu(instance_norm(y))
            h = nn.Conv(out_ch, (3, 3), strides=(2, 2),
                        padding=[(1, 1), (1, 1)], dtype=self.dtype,
                        name=f"block{i}_conv1")(h)
            h = nn.relu(instance_norm(h))
            h = nn.Conv(out_ch, (3, 3), padding=[(1, 1), (1, 1)],
                        dtype=self.dtype, name=f"block{i}_conv2")(h)
            # Pad odd dims so the pool's floor(d/2) matches the stride-2
            # conv's ceil(d/2) (e.g. 624 -> 39 -> 20 at block3);
            # count_include_pad=False keeps edge averages unbiased.
            ph, pw = y.shape[1] % 2, y.shape[2] % 2
            s = nn.avg_pool(y, (2, 2), strides=(2, 2),
                            padding=((0, ph), (0, pw)),
                            count_include_pad=False)
            if ch != out_ch:
                s = nn.Conv(out_ch, (1, 1), use_bias=False,
                            dtype=self.dtype, name=f"block{i}_skip")(s)
            y = h + s
            ch = out_ch
        y = nn.relu(y.astype(jnp.float32))
        y = jnp.mean(y, axis=(1, 2))                    # global avg pool
        mu = nn.Dense(self.nz, name="fc_mu")(y)
        logvar = nn.Dense(self.nz, name="fc_logvar")(y)
        return mu, logvar


def reparameterize(mu: jnp.ndarray, logvar: jnp.ndarray,
                   rng: jax.Array) -> jnp.ndarray:
    """z = mu + exp(logvar/2) * eps (pix2pixHD_model.py:194-196)."""
    eps = jax.random.normal(rng, mu.shape, mu.dtype)
    return mu + jnp.exp(0.5 * logvar) * eps


def kl_loss(mu: jnp.ndarray, logvar: jnp.ndarray) -> jnp.ndarray:
    """Summed KL(q(z|x) || N(0,1)) (pix2pixHD_model.py:235-237):
    -0.5 * sum(1 + logvar - mu^2 - exp(logvar))."""
    return -0.5 * jnp.sum(1.0 + logvar - mu ** 2 - jnp.exp(logvar))


def instance_average(features: jnp.ndarray, inst_slots: jnp.ndarray,
                     max_instances: int) -> jnp.ndarray:
    """Instance-wise average pooling (networks.py:310-326, vectorized).

    features [B, H, W, F]; inst_slots [B, H, W] int in [0, max_instances).
    Every pixel's features are replaced by the mean over its instance's
    pixels (per batch item).
    """
    B, H, W, F = features.shape
    ids = inst_slots.reshape(B, H * W) + (
        jnp.arange(B, dtype=inst_slots.dtype) * max_instances)[:, None]
    ids = ids.reshape(-1)
    flat = features.reshape(-1, F)
    n_seg = B * max_instances
    sums = jax.ops.segment_sum(flat, ids, num_segments=n_seg)
    counts = jax.ops.segment_sum(jnp.ones((flat.shape[0], 1), flat.dtype),
                                 ids, num_segments=n_seg)
    means = sums / jnp.maximum(counts, 1.0)
    return means[ids].reshape(B, H, W, F)


def instance_feature_means(features: jnp.ndarray, inst_slots: jnp.ndarray,
                           max_instances: int
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-instance mean feature table (generate_feat_dict,
    networks.py:328-346): [B, max_instances, F] + count [B, max_instances]."""
    B, H, W, F = features.shape
    ids = inst_slots.reshape(B, H * W) + (
        jnp.arange(B, dtype=inst_slots.dtype) * max_instances)[:, None]
    ids = ids.reshape(-1)
    flat = features.reshape(-1, F)
    n_seg = B * max_instances
    sums = jax.ops.segment_sum(flat, ids, num_segments=n_seg)
    counts = jax.ops.segment_sum(jnp.ones((flat.shape[0],), flat.dtype),
                                 ids, num_segments=n_seg)
    means = sums / jnp.maximum(counts[:, None], 1.0)
    return (means.reshape(B, max_instances, F),
            counts.reshape(B, max_instances))


def gan_loss_lsgan(preds: List[List[jnp.ndarray]],
                   target_is_real: bool) -> jnp.ndarray:
    """LSGAN loss over multiscale intermediate-feature outputs
    (networks.py:92-134): MSE of the last feature map of each scale."""
    target = 1.0 if target_is_real else 0.0
    loss = 0.0
    for scale in preds:
        pred = scale[-1]
        loss = loss + jnp.mean((pred - target) ** 2)
    return loss


def feature_matching_loss(pred_fake: List[List[jnp.ndarray]],
                          pred_real: List[List[jnp.ndarray]],
                          num_D: int, n_layers: int,
                          lambda_feat: float = 10.0) -> jnp.ndarray:
    """D-feature-matching loss (pix2pixHD_model.py:219-226)."""
    feat_weights = 4.0 / (n_layers + 1)
    D_weights = 1.0 / num_D
    loss = 0.0
    for i in range(num_D):
        for j in range(len(pred_fake[i]) - 1):
            loss = loss + D_weights * feat_weights * jnp.mean(
                jnp.abs(pred_fake[i][j]
                        - jax.lax.stop_gradient(pred_real[i][j])))
    return loss * lambda_feat


def get_edges(inst: jnp.ndarray) -> jnp.ndarray:
    """Instance boundary map (pix2pixHD_model.py:343-349).

    inst [B, H, W] int -> float edge map [B, H, W, 1]."""
    e = jnp.zeros(inst.shape, bool)
    e = e.at[:, :, 1:].set(e[:, :, 1:] | (inst[:, :, 1:] != inst[:, :, :-1]))
    e = e.at[:, :, :-1].set(e[:, :, :-1] | (inst[:, :, 1:] != inst[:, :, :-1]))
    e = e.at[:, 1:, :].set(e[:, 1:, :] | (inst[:, 1:, :] != inst[:, :-1, :]))
    e = e.at[:, :-1, :].set(e[:, :-1, :] | (inst[:, 1:, :] != inst[:, :-1, :]))
    return e[..., None].astype(jnp.float32)
