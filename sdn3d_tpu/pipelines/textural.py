"""Textural branch pipeline: pix2pixHD training + inference.

Re-expression of textural/models/pix2pixHD_model.py (encode_input :124-166,
forward :176-246, fake_inference :248-280) and textural/train.py (alternating
G/D Adam steps).

3D-SDN configuration (textural/options): label_nc=14, instance edge map,
feat_num=5 instance codes, 24-bin one-hot pose (+1 bg), normal map,
optional depth; LSGAN + D-feature-matching (lambda_feat=5) + VGG perceptual
(lambda_feat) + L1 (lambda_L1=10); Adam(2e-4, beta1=0.5); netG input
channels = 14+1+5+25+3 (+1 with depth) = 48 (49).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from sdn3d_tpu.models.pix2pixhd import (
    Encoder, GlobalEncoder, GlobalGenerator, MultiscaleDiscriminator,
    get_edges, instance_average, instance_feature_means, gan_loss_lsgan,
    feature_matching_loss, kl_loss, reparameterize)
from sdn3d_tpu.models.vgg import Vgg19Features, vgg_loss
from sdn3d_tpu.utils.image_pool import DeviceImagePool, ImagePool


@dataclasses.dataclass(frozen=True)
class TexturalConfig:
    label_nc: int = 14
    output_nc: int = 3
    ngf: int = 64
    ndf: int = 64
    nef: int = 16
    feat_num: int = 5
    n_downsample_global: int = 4
    n_blocks_global: int = 9
    n_downsample_e: int = 4
    n_layers_d: int = 3
    num_d: int = 2
    use_instance_edges: bool = True
    feat_pose: bool = True
    pose_bins: int = 24
    feat_normal: bool = True
    feat_depth: bool = False
    lambda_feat: float = 5.0
    lambda_l1: float = 10.0
    lr: float = 2e-4
    beta1: float = 0.5
    use_vgg_loss: bool = True
    max_instances: int = 64
    # Global-encoder VAE option (pix2pixHD_model.py:190-198,235-237; off by
    # default per base_options.py:65): a resnet encoder maps the real image
    # to an nz-dim latent, the reparameterized sample is broadcast as nz
    # extra netG channels, and a KL term (weight lambda_kl,
    # train_options.py:39) is added to the G objective.
    use_global_encoder: bool = False
    global_encoder_nz: int = 3
    global_encoder_nef: int = 64
    lambda_kl: float = 0.01
    # GAN history buffer for the D fake loss (pix2pixHD_model.py:171,202;
    # size 0 = pass-through, the reference default train_options.py:35)
    pool_size: int = 0
    # computation dtype for G/D/E convs ("bfloat16" ~5x faster on v5e;
    # params, norms and losses stay float32)
    compute_dtype: str = "float32"

    @property
    def netG_input_nc(self) -> int:
        nc = self.label_nc
        if self.use_instance_edges:
            nc += 1
        nc += self.feat_num
        if self.feat_pose:
            nc += self.pose_bins + 1
        if self.feat_normal:
            nc += 3
        if self.feat_depth:
            nc += 1
        if self.use_global_encoder:
            nc += self.global_encoder_nz   # pix2pixHD_model.py:41-42
        return nc

    @property
    def netD_input_nc(self) -> int:
        nc = self.label_nc + self.output_nc
        if self.use_instance_edges:
            nc += 1
        return nc


# Shrunken net dims for --small smoke runs (one definition shared by the
# train CLI and config_from_train_meta so checkpoints round-trip).
SMALL_NET_OVERRIDES = dict(ngf=8, ndf=8, nef=4, n_downsample_global=2,
                           n_blocks_global=2, n_downsample_e=2,
                           n_layers_d=2, max_instances=8)


def config_from_train_meta(meta: dict, **overrides) -> TexturalConfig:
    """Rebuild the architecture-affecting TexturalConfig fields from a
    checkpoint manifest's training meta (the vars(args) persisted by
    cli/textural_train.py) — the TPU analogue of the reference persisting
    opt.txt at train time (options/base_options.py:112-128) so test/edit
    programs reconstruct the nets the checkpoint was trained with
    (e.g. --use_global_encoder changes the G input channels and the
    opt_g tree).  `overrides` (inference-time choices such as
    compute_dtype / use_vgg_loss) win over meta."""
    kw = {}
    if meta.get("small"):
        kw.update(SMALL_NET_OVERRIDES)
    for k in ("use_global_encoder", "pool_size", "lr"):
        if k in meta:
            kw[k] = meta[k]
    if "no_vgg" in meta:
        kw["use_vgg_loss"] = not meta["no_vgg"]
    kw.update(overrides)
    return TexturalConfig(**kw)


def one_hot_label(label_map: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """label_map [B, H, W] int -> one-hot [B, H, W, C]
    (pix2pixHD_model.py:128-132).

    NOTE: shifted labels reach 14 (Vegetation raw 13 + 1) while
    label_nc=14 encodes indices 0..13 — jax.nn.one_hot maps the
    out-of-range id to an all-zero row, which is exactly what the
    reference's CUDA scatter_ does with asserts off; kept for
    behavioral parity."""
    return jax.nn.one_hot(label_map, num_classes, dtype=jnp.float32)


def encode_input(cfg: TexturalConfig,
                 label_map: jnp.ndarray,        # [B, H, W] int
                 inst_map: jnp.ndarray,         # [B, H, W] int
                 pose_map: Optional[jnp.ndarray] = None,   # [B, H, W] int bins
                 normal_map: Optional[jnp.ndarray] = None,  # [B, H, W, 3]
                 depth_map: Optional[jnp.ndarray] = None,   # [B, H, W, 1]
                 ) -> jnp.ndarray:
    """Build the conditioning stack (without the feat codes):
    one-hot label ‖ instance edges (pix2pixHD_model.py:124-166)."""
    parts = [one_hot_label(label_map, cfg.label_nc)]
    if cfg.use_instance_edges:
        parts.append(get_edges(inst_map))
    return jnp.concatenate(parts, axis=-1)


def assemble_generator_input(cfg: TexturalConfig, input_label: jnp.ndarray,
                             feat_map: jnp.ndarray,
                             pose_map: Optional[jnp.ndarray],
                             normal_map: Optional[jnp.ndarray],
                             depth_map: Optional[jnp.ndarray]) -> jnp.ndarray:
    parts = [input_label, feat_map]
    if cfg.feat_pose:
        parts.append(jax.nn.one_hot(pose_map, cfg.pose_bins + 1,
                                    dtype=jnp.float32))
    if cfg.feat_normal:
        parts.append(normal_map)
    if cfg.feat_depth:
        parts.append(depth_map)
    return jnp.concatenate(parts, axis=-1)


@flax.struct.dataclass
class TexturalState:
    step: jnp.ndarray
    params_g: Any
    params_d: Any
    params_e: Any
    vgg: Any
    opt_g: Any
    opt_d: Any
    # global-encoder (netGlobalE) params; empty dict unless
    # cfg.use_global_encoder
    params_ge: Any = flax.struct.field(default_factory=dict)


@dataclasses.dataclass
class TexturalTrainer:
    cfg: TexturalConfig = TexturalConfig()

    def __post_init__(self):
        c = self.cfg
        import jax.numpy as _jnp
        dt = _jnp.dtype(c.compute_dtype)
        self.netG = GlobalGenerator(c.output_nc, c.ngf, c.n_downsample_global,
                                    c.n_blocks_global, dtype=dt)
        self.netD = MultiscaleDiscriminator(c.ndf, c.n_layers_d, c.num_d,
                                            dtype=dt)
        self.netE = Encoder(c.feat_num, c.nef, c.n_downsample_e, dtype=dt)
        self.netGlobalE = (GlobalEncoder(c.global_encoder_nz,
                                         c.global_encoder_nef, dtype=dt)
                           if c.use_global_encoder else None)
        self.fake_pool = ImagePool(c.pool_size)
        self.tx_g = optax.adam(c.lr, b1=c.beta1, b2=0.999)
        self.tx_d = optax.adam(c.lr, b1=c.beta1, b2=0.999)
        # jit-cached inference entry points (eager flax apply dispatches
        # op-by-op through the device relay — seconds per frame on TPU)
        self.fake_inference_jit = jax.jit(self.fake_inference)
        self.encode_features_jit = jax.jit(
            lambda params_e, image: self.netE.apply({"params": params_e},
                                                    image))
        # netE + per-slot mean table in ONE program: the edit path only
        # needs the [max_instances, feat] source-code table, so fetching
        # it (~1 KB) instead of the [H, W, feat] feature map saves the
        # 2.4 MB/source d2h over the relay.  Fused with the encoder (a
        # STANDALONE tiny segment-sum program intermittently wedges this
        # relay — see assemble_edit_conditioning's history).
        self.encode_feat_means_jit = jax.jit(
            lambda params_e, image, slots: instance_feature_means(
                self.netE.apply({"params": params_e}, image), slots,
                self.cfg.max_instances)[0])
        self._generate_concat_jit = jax.jit(
            lambda state, batch, rng=None: self._generate(
                state.params_g, state.params_e, batch, state.params_ge, rng))

    def init(self, rng: jax.Array, height: int = 192, width: int = 624
             ) -> TexturalState:
        c = self.cfg
        kg, kd, ke, kv = jax.random.split(rng, 4)
        pg = self.netG.init(kg, jnp.zeros((1, height, width,
                                           c.netG_input_nc)))["params"]
        pd = self.netD.init(kd, jnp.zeros((1, height, width,
                                           c.netD_input_nc)))["params"]
        pe = self.netE.init(ke, jnp.zeros((1, height, width,
                                           c.output_nc)))["params"]
        vgg = Vgg19Features().init(kv, jnp.zeros((1, 64, 64, 3)))
        pge = {}
        if c.use_global_encoder:
            kge = jax.random.fold_in(kv, 1)
            pge = self.netGlobalE.init(
                kge, jnp.zeros((1, height, width, c.output_nc)))["params"]
        # netGlobalE params ride the G optimizer (pix2pixHD_model.py:111-113)
        return TexturalState(
            step=jnp.zeros((), jnp.int32),
            params_g=pg, params_d=pd, params_e=pe, vgg=vgg,
            opt_g=self.tx_g.init({"g": pg, "e": pe, "ge": pge}),
            opt_d=self.tx_d.init(pd),
            params_ge=pge,
        )

    def _generate(self, params_g, params_e, batch: Dict[str, jnp.ndarray],
                  params_ge=None, rng: Optional[jax.Array] = None
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, Tuple]:
        """-> (fake, input_label, (mu, logvar) or (None, None)).

        With use_global_encoder: encode the real image to (mu, logvar),
        sample z and broadcast it over H x W as extra netG channels
        (pix2pixHD_model.py:192-198)."""
        c = self.cfg
        input_label = encode_input(c, batch["label"], batch["inst"])
        feats = self.netE.apply({"params": params_e}, batch["image"])
        feat_map = instance_average(feats, batch["inst_slots"],
                                    c.max_instances)
        g_in = assemble_generator_input(
            c, input_label, feat_map, batch.get("pose"),
            batch.get("normal"), batch.get("depth"))
        mu = logvar = None
        if c.use_global_encoder:
            g_in, mu, logvar = self._append_global_z(
                params_ge, g_in, batch["image"], rng)
        fake = self.netG.apply({"params": params_g}, g_in)
        return fake, input_label, (mu, logvar)

    def _append_global_z(self, params_ge, g_in: jnp.ndarray,
                         image: jnp.ndarray,
                         rng: Optional[jax.Array]
                         ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Global-encoder conditioning
        (pix2pixHD_model.py:190-198,265-271): encode the image to
        (mu, logvar), z = reparameterized sample (posterior mean when rng
        is None), broadcast over H x W as extra netG channels.  The ONE
        implementation shared by train-time generation and
        fake_inference."""
        mu, logvar = self.netGlobalE.apply({"params": params_ge}, image)
        z = reparameterize(mu, logvar, rng) if rng is not None else mu
        B, H, W, _ = g_in.shape
        zmap = jnp.broadcast_to(z[:, None, None, :],
                                (B, H, W, self.cfg.global_encoder_nz))
        return jnp.concatenate([g_in, zmap], axis=-1), mu, logvar

    def make_g_step(self):
        """Generator(+encoders) update (train.py:86-90).  `rng` drives the
        global-encoder z sample; required when cfg.use_global_encoder."""
        def g_step(state: TexturalState, batch: Dict[str, jnp.ndarray],
                   rng: Optional[jax.Array] = None
                   ) -> Tuple[TexturalState, Dict[str, jnp.ndarray]]:
            c = self.cfg
            if c.use_global_encoder and rng is None:
                # Training on the posterior MEAN while the KL term pulls
                # (mu, logvar) toward N(0,1) is a silent VAE bug; the mean
                # path is for inference only (fake_inference).
                raise ValueError(
                    "g_step requires rng when cfg.use_global_encoder")

            def loss_fn(p):
                fake, input_label, (mu, logvar) = self._generate(
                    p["g"], p["e"], batch, p["ge"], rng)
                pred_fake = self.netD.apply(
                    {"params": state.params_d},
                    jnp.concatenate([input_label, fake], axis=-1))
                pred_real = self.netD.apply(
                    {"params": state.params_d},
                    jnp.concatenate([input_label, batch["image"]], axis=-1))
                loss_gan = gan_loss_lsgan(pred_fake, True)
                loss_feat = feature_matching_loss(
                    pred_fake, pred_real, c.num_d, c.n_layers_d,
                    c.lambda_feat)
                loss_l1 = c.lambda_l1 * jnp.mean(
                    jnp.abs(fake - batch["image"]))
                loss_vgg = 0.0
                if c.use_vgg_loss:
                    loss_vgg = c.lambda_feat * vgg_loss(state.vgg, fake,
                                                        batch["image"])
                total = loss_gan + loss_feat + loss_l1 + loss_vgg
                aux = {"G_GAN": loss_gan, "G_GAN_Feat": loss_feat,
                       "G_L1": loss_l1, "G_VGG": loss_vgg}
                if c.use_global_encoder:
                    # KL(q(z|x) || N(0,1)) * lambda_KL
                    # (pix2pixHD_model.py:235-238, train_options.py:39)
                    loss_kl = c.lambda_kl * kl_loss(mu, logvar)
                    total = total + loss_kl
                    aux["E_VAE"] = loss_kl
                return total, aux

            params = {"g": state.params_g, "e": state.params_e,
                      "ge": state.params_ge}
            grads, losses = jax.grad(loss_fn, has_aux=True)(params)
            updates, opt_g = self.tx_g.update(grads, state.opt_g, params)
            new = optax.apply_updates(params, updates)
            return dataclasses.replace(
                state, step=state.step + 1, params_g=new["g"],
                params_e=new["e"], params_ge=new["ge"], opt_g=opt_g), losses

        return g_step

    def make_d_step(self):
        """Discriminator update (train.py:92-95).

        `fake_concat` (optional [B, H, W, label+edge+3]) is a precomputed —
        possibly history-pooled (pix2pixHD_model.py:171) — conditioning‖fake
        stack for the D fake branch; when None the current G output is used
        (the pool_size=0 default).  Pool usage lives OUTSIDE jit: see
        `pooled_fake_concat`."""
        def d_step(state: TexturalState, batch: Dict[str, jnp.ndarray],
                   rng: Optional[jax.Array] = None,
                   fake_concat: Optional[jnp.ndarray] = None
                   ) -> Tuple[TexturalState, Dict[str, jnp.ndarray]]:
            if (self.cfg.use_global_encoder and fake_concat is None
                    and rng is None):
                raise ValueError(
                    "d_step requires rng when cfg.use_global_encoder "
                    "and no precomputed fake_concat is given")
            if fake_concat is None:
                fake, input_label, _ = self._generate(
                    state.params_g, state.params_e, batch,
                    state.params_ge, rng)
                fake_concat = jnp.concatenate([input_label, fake], axis=-1)
            else:
                input_label = encode_input(self.cfg, batch["label"],
                                           batch["inst"])
            fake_concat = jax.lax.stop_gradient(fake_concat)

            def loss_fn(pd):
                pred_fake = self.netD.apply({"params": pd}, fake_concat)
                pred_real = self.netD.apply(
                    {"params": pd},
                    jnp.concatenate([input_label, batch["image"]], axis=-1))
                # 0.5x convention (train.py loss_D = (fake+real)*0.5)
                l_fake = gan_loss_lsgan(pred_fake, False)
                l_real = gan_loss_lsgan(pred_real, True)
                return 0.5 * (l_fake + l_real), {"D_fake": l_fake,
                                                 "D_real": l_real}

            grads, losses = jax.grad(loss_fn, has_aux=True)(state.params_d)
            updates, opt_d = self.tx_d.update(grads, state.opt_d,
                                              state.params_d)
            pd = optax.apply_updates(state.params_d, updates)
            return dataclasses.replace(state, params_d=pd, opt_d=opt_d), \
                losses

        return d_step

    def device_pool(self, height: int, width: int) -> DeviceImagePool:
        """Device-resident history pool sized for this config's
        fake-concat stack [H, W, netD_input_nc] (f32: the concat of
        one-hot conditioning with the G output promotes to f32)."""
        return DeviceImagePool.create(
            self.cfg.pool_size, (height, width, self.cfg.netD_input_nc))

    def make_train_iteration(self):
        """ONE jitted program per training iteration: G update + history
        pool + D update, zero host round-trips.

        This is the reference's actual per-iteration semantics
        (train.py:61-95 + pix2pixHD_model.py:176-246): a single forward
        produces the fake; loss_G updates G/E and loss_D_fake sees the
        SAME (detached, possibly pool-swapped) fake.  The two-dispatch
        g_step/d_step path regenerates the fake with the updated G for
        its D step — both orderings are valid GAN alternations, but the
        fused one is reference-faithful AND saves a full G forward.
        The r4 bench protocol additionally fetched the [B,H,W,18] stack
        to the host pool and re-uploaded it (~17 MB + a sync per
        iteration over the relay) — the pool now lives on device
        (utils/image_pool.py:DeviceImagePool; VERDICT r4 item 4).

        Signature: iteration(state, batch, rng, pool=None) ->
        (state, losses, pool).  `rng` drives the global-encoder z sample
        and the pool swap; pass a `device_pool(...)` when
        cfg.pool_size > 0 and thread it through iterations.
        """
        c = self.cfg

        def iteration(state: TexturalState, batch: Dict[str, jnp.ndarray],
                      rng: Optional[jax.Array] = None,
                      pool: Optional[DeviceImagePool] = None
                      ) -> Tuple[TexturalState, Dict[str, jnp.ndarray],
                                 Optional[DeviceImagePool]]:
            if c.use_global_encoder and rng is None:
                raise ValueError("train_iteration requires rng when "
                                 "cfg.use_global_encoder")
            if pool is not None and rng is None:
                raise ValueError("train_iteration requires rng when a "
                                 "history pool is used")
            kz = kpool = None
            if rng is not None:
                kz, kpool = jax.random.split(rng)

            def loss_fn(p):
                fake, input_label, (mu, logvar) = self._generate(
                    p["g"], p["e"], batch, p["ge"], kz)
                pred_fake = self.netD.apply(
                    {"params": state.params_d},
                    jnp.concatenate([input_label, fake], axis=-1))
                pred_real = self.netD.apply(
                    {"params": state.params_d},
                    jnp.concatenate([input_label, batch["image"]],
                                    axis=-1))
                loss_gan = gan_loss_lsgan(pred_fake, True)
                loss_feat = feature_matching_loss(
                    pred_fake, pred_real, c.num_d, c.n_layers_d,
                    c.lambda_feat)
                loss_l1 = c.lambda_l1 * jnp.mean(
                    jnp.abs(fake - batch["image"]))
                loss_vgg = 0.0
                if c.use_vgg_loss:
                    loss_vgg = c.lambda_feat * vgg_loss(state.vgg, fake,
                                                        batch["image"])
                total = loss_gan + loss_feat + loss_l1 + loss_vgg
                aux = {"G_GAN": loss_gan, "G_GAN_Feat": loss_feat,
                       "G_L1": loss_l1, "G_VGG": loss_vgg}
                if c.use_global_encoder:
                    loss_kl = c.lambda_kl * kl_loss(mu, logvar)
                    total = total + loss_kl
                    aux["E_VAE"] = loss_kl
                return total, (aux, fake, input_label)

            params = {"g": state.params_g, "e": state.params_e,
                      "ge": state.params_ge}
            grads, (g_losses, fake, input_label) = jax.grad(
                loss_fn, has_aux=True)(params)
            updates, opt_g = self.tx_g.update(grads, state.opt_g, params)
            new = optax.apply_updates(params, updates)

            fake_concat = jax.lax.stop_gradient(
                jnp.concatenate([input_label, fake], axis=-1))
            if pool is not None:
                fake_concat, pool = pool.query(fake_concat, kpool)

            def d_loss_fn(pd):
                pred_fake = self.netD.apply({"params": pd}, fake_concat)
                pred_real = self.netD.apply(
                    {"params": pd},
                    jnp.concatenate([input_label, batch["image"]],
                                    axis=-1))
                l_fake = gan_loss_lsgan(pred_fake, False)
                l_real = gan_loss_lsgan(pred_real, True)
                return 0.5 * (l_fake + l_real), {"D_fake": l_fake,
                                                 "D_real": l_real}

            grads_d, d_losses = jax.grad(d_loss_fn, has_aux=True)(
                state.params_d)
            updates_d, opt_d = self.tx_d.update(grads_d, state.opt_d,
                                                state.params_d)
            pd = optax.apply_updates(state.params_d, updates_d)
            new_state = dataclasses.replace(
                state, step=state.step + 1, params_g=new["g"],
                params_e=new["e"], params_ge=new["ge"], opt_g=opt_g,
                params_d=pd, opt_d=opt_d)
            return new_state, {**g_losses, **d_losses}, pool

        return iteration

    def fake_inference(self, state: TexturalState,
                       batch: Dict[str, jnp.ndarray],
                       feat_map: Optional[jnp.ndarray] = None,
                       rng: Optional[jax.Array] = None) -> jnp.ndarray:
        """Edit-time generation (pix2pixHD_model.py:248-280): condition on a
        precomputed per-pixel feat map (from source-image codes) or run the
        encoder on the given image.  With use_global_encoder the z sample
        is drawn from the image's posterior — the reference samples eps at
        inference too (pix2pixHD_model.py:265-271); pass rng=None to use the
        posterior mean instead.

        Serving-path compression (the TPU relay uploads at ~70 MB/s, so
        conditioning bytes are wall-clock): `feat_map` may be a per-slot
        TABLE [B, max_instances, feat] expanded on device through
        batch["inst_slots"] (bit-identical to the host splat — a gather
        of the same f32 codes), and batch["normal"] may arrive as the
        raw uint8 PNG bytes, normalized here with assemble_condition_maps'
        exact math."""
        c = self.cfg
        inst = batch["inst"]
        if inst.dtype == jnp.uint8:
            # serving contract: the RAW instance plane (uint8, <= 255)
            # travels instead of the int32 k*1000 map; the reconstruction
            # below is assemble_condition_maps' exact integer math
            # (textural_data.py:86-97: background pixels carry the
            # relabeled segm, instance pixels k*1000), so get_edges sees
            # identical ids — 1 byte/pixel instead of 4 over the relay.
            inst = jnp.where(inst == 0,
                             batch["label"].astype(jnp.int32),
                             inst.astype(jnp.int32) * 1000)
        input_label = encode_input(c, batch["label"], inst)
        if feat_map is None:
            feats = self.netE.apply({"params": state.params_e},
                                    batch["image"])
            feat_map = instance_average(feats, batch["inst_slots"],
                                        c.max_instances)
        elif feat_map.ndim == 3:            # [B, max_instances, feat]
            feat_map = jax.vmap(lambda t, s: t[s])(
                feat_map, batch["inst_slots"])
        normal = batch.get("normal")
        if normal is not None and normal.dtype == jnp.uint8:
            # uint8 PNG bytes -> assemble_condition_maps' normalization
            # (textural_data.py: (x/255 - 0.5)/0.5 + 1/255), same f32 ops
            normal = (normal.astype(jnp.float32) / 255.0 - 0.5) / 0.5 \
                + 1.0 / 255.0
        if normal is not None and "normal_valid" in batch:
            # frames with NO normal map (the reference's 'no cars' case,
            # textural/edit_vkitti.py:88-95) condition on exact 0.0 — the
            # uint8 normalization above would turn their zero bytes into
            # ~-0.996, silently shifting feat_normal generators.
            normal = normal * batch["normal_valid"][:, None, None, None]
        g_in = assemble_generator_input(
            c, input_label, feat_map, batch.get("pose"),
            normal, batch.get("depth"))
        if c.use_global_encoder:
            g_in, _, _ = self._append_global_z(state.params_ge, g_in,
                                               batch["image"], rng)
        return self.netG.apply({"params": state.params_g}, g_in)

    def pooled_fake_concat(self, state: TexturalState,
                           batch: Dict[str, jnp.ndarray],
                           rng: Optional[jax.Array] = None) -> jnp.ndarray:
        """Generate the conditioning‖fake stack and query the (host-side)
        history pool — the use_pool=True path of the reference's
        discriminate() (pix2pixHD_model.py:168-174).  Call OUTSIDE jit and
        pass the result to d_step as fake_concat."""
        fake, input_label, _ = self._generate_concat_jit(state, batch, rng)
        concat = np.asarray(jnp.concatenate([input_label, fake], axis=-1))
        return jnp.asarray(self.fake_pool.query(concat))
