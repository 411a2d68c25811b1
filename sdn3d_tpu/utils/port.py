"""PyTorch state_dict -> flax variables weight porting.

The reference ships four checkpoint families (SURVEY.md §5: semantic
encoder/decoder .pth, derender3d bulb ckpt, maskrcnn .pth, pix2pixHD
G/D/E .pth).  These converters map their state_dicts onto the flax models
in sdn3d_tpu.models, handling layout transposes:

  conv        [O, I, kh, kw] -> [kh, kw, I, O]
  conv_transpose [I, O, kh, kw] -> [kh, kw, O, I] flipped spatially
                 (torch ConvTranspose2d == lax.conv_transpose with
                 transpose_kernel semantics; validated in tests)
  linear      [O, I] -> [I, O]
  batchnorm   weight/bias -> scale/bias; running_* -> batch_stats

Checkpoints themselves are not redistributable here; converters are
validated against reference-architecture torch models with random weights
(tests/test_weight_port.py).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def t_conv(w) -> np.ndarray:
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def t_convT(w) -> np.ndarray:
    # torch ConvTranspose2d weight [I, O, kh, kw]; flax ConvTranspose with
    # transpose_kernel=True expects [kh, kw, O, I].
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def t_linear(w) -> np.ndarray:
    return np.transpose(np.asarray(w), (1, 0))


def _conv(sd, name):
    p = {"kernel": t_conv(sd[f"{name}.weight"])}
    if f"{name}.bias" in sd:
        p["bias"] = np.asarray(sd[f"{name}.bias"])
    return p


def _convT(sd, name):
    p = {"kernel": t_convT(sd[f"{name}.weight"])}
    if f"{name}.bias" in sd:
        p["bias"] = np.asarray(sd[f"{name}.bias"])
    return p


def _linear(sd, name):
    return {"kernel": t_linear(sd[f"{name}.weight"]),
            "bias": np.asarray(sd[f"{name}.bias"])}


def _bn(sd, name) -> Tuple[dict, dict]:
    params = {"scale": np.asarray(sd[f"{name}.weight"]),
              "bias": np.asarray(sd[f"{name}.bias"])}
    stats = {"mean": np.asarray(sd[f"{name}.running_mean"]),
             "var": np.asarray(sd[f"{name}.running_var"])}
    return params, stats


def _to_np(sd):
    import torch
    return {k: (v.detach().cpu().numpy() if isinstance(v, torch.Tensor)
                else np.asarray(v)) for k, v in sd.items()}


# ---------------------------------------------------------------------------
# ResNet trunks
# ---------------------------------------------------------------------------

def _port_resnet_trunk(sd: Dict[str, np.ndarray], prefix: str,
                       stage_sizes, bottleneck: bool, deep_stem: bool
                       ) -> Tuple[dict, dict]:
    """Torch resnet (torchvision or semantic/resnet.py layout) -> flax
    ResNet params/batch_stats dicts."""
    P, S = {}, {}

    def bn(src, dst):
        P[dst], S[dst] = _bn(sd, src)

    stem_convs = ["conv1", "conv2", "conv3"] if deep_stem else ["conv1"]
    for c in stem_convs:
        P[c] = _conv(sd, f"{prefix}{c}")
        bn(f"{prefix}{c.replace('conv', 'bn')}", c.replace("conv", "bn"))

    n_convs = 3 if bottleneck else 2
    for i, blocks in enumerate(stage_sizes):
        for j in range(blocks):
            src = f"{prefix}layer{i + 1}.{j}"
            dst = f"layer{i + 1}_{j}"
            block = {}
            bstats = {}
            for k in range(1, n_convs + 1):
                block[f"conv{k}"] = _conv(sd, f"{src}.conv{k}")
                bp, bs = _bn(sd, f"{src}.bn{k}")
                block[f"bn{k}"] = bp
                bstats[f"bn{k}"] = bs
            if f"{src}.downsample.0.weight" in sd:
                block["downsample_conv"] = _conv(sd, f"{src}.downsample.0")
                bp, bs = _bn(sd, f"{src}.downsample.1")
                block["downsample_bn"] = bp
                bstats["downsample_bn"] = bs
            P[dst] = block
            S[dst] = bstats
    return P, S


def port_semantic(encoder_sd, decoder_sd, pool_scales=(1, 2, 3, 6)) -> dict:
    """semantic encoder (ResnetDilated resnet50 deep-stem) + decoder
    (PPMBilinearDeepsup) -> SemanticModel variables."""
    enc_sd = _to_np(encoder_sd)
    dec_sd = _to_np(decoder_sd)
    enc_P, enc_S = _port_resnet_trunk(enc_sd, "", (3, 4, 6, 3),
                                      bottleneck=True, deep_stem=True)

    dec_P, dec_S = {}, {}
    for k in range(len(pool_scales)):
        dec_P[f"ppm{k}_conv"] = _conv(dec_sd, f"ppm.{k}.1")
        dec_P[f"ppm{k}_bn"], dec_S[f"ppm{k}_bn"] = _bn(dec_sd, f"ppm.{k}.2")
    dec_P["conv_last0"] = _conv(dec_sd, "conv_last.0")
    dec_P["conv_last_bn"], dec_S["conv_last_bn"] = _bn(dec_sd, "conv_last.1")
    dec_P["conv_last1"] = _conv(dec_sd, "conv_last.4")
    dec_P["cbr_deepsup"] = {"conv": _conv(dec_sd, "cbr_deepsup.0")}
    bp, bs = _bn(dec_sd, "cbr_deepsup.1")
    dec_P["cbr_deepsup"]["bn"] = bp
    dec_S["cbr_deepsup"] = {"bn": bs}
    dec_P["conv_last_deepsup"] = _conv(dec_sd, "conv_last_deepsup")

    return {
        "params": {"encoder": enc_P, "decoder": dec_P},
        "batch_stats": {"encoder": enc_S, "decoder": dec_S},
    }


def port_derenderer(sd) -> dict:
    """Derenderer (derender3d/models/derenderer.py: torchvision resnet18 +
    fc heads) -> Derenderer variables.  Torch names: net.conv1, net.layer*,
    net.fc, fc1, fc2, _fc3."""
    sd = _to_np(sd)
    trunk_P, trunk_S = _port_resnet_trunk(sd, "net.", (2, 2, 2, 2),
                                          bottleneck=False, deep_stem=False)
    P = {
        "net": {
            "trunk": trunk_P,
            "fc": _linear(sd, "net.fc"),
        },
        "fc1": _linear(sd, "fc1"),
        "fc2": _linear(sd, "fc2"),
        "fc3": _linear(sd, "_fc3"),
    }
    S = {"net": {"trunk": trunk_S}}
    return {"params": P, "batch_stats": S}


# ---------------------------------------------------------------------------
# pix2pixHD
# ---------------------------------------------------------------------------

def port_global_generator(sd, ngf=64, n_downsampling=4, n_blocks=9) -> dict:
    """GlobalGenerator state_dict (sequential 'model.N.*' names,
    networks.py:211-242) -> flax GlobalGenerator params.

    Sequential index layout: 1=conv_in, then per downsample i:
    4+3i=conv; then blocks at base+? (instance norm has no params);
    computed below."""
    sd = _to_np(sd)
    P = {}
    idx = 1
    P["conv_in"] = _conv(sd, f"model.{idx}")
    idx += 3                       # conv, norm, relu
    for i in range(n_downsampling):
        P[f"down{i}"] = _conv(sd, f"model.{idx}")
        idx += 3
    for i in range(n_blocks):
        P[f"res{i}"] = {
            "conv1": _conv(sd, f"model.{idx}.conv_block.1"),
            "conv2": _conv(sd, f"model.{idx}.conv_block.5"),
        }
        idx += 1
    for i in range(n_downsampling):
        P[f"up{i}"] = _convT(sd, f"model.{idx}")
        idx += 3
    idx += 1                       # reflection pad
    P["conv_out"] = _conv(sd, f"model.{idx}")
    return {"params": P}


def port_encoder(sd, n_downsampling=4) -> dict:
    """pix2pixHD Encoder (networks.py:286-346) -> flax Encoder params."""
    sd = _to_np(sd)
    P = {}
    idx = 1
    P["conv_in"] = _conv(sd, f"model.{idx}")
    idx += 3
    for i in range(n_downsampling):
        P[f"down{i}"] = _conv(sd, f"model.{idx}")
        idx += 3
    for i in range(n_downsampling):
        P[f"up{i}"] = _convT(sd, f"model.{idx}")
        idx += 3
    idx += 1
    P["conv_out"] = _conv(sd, f"model.{idx}")
    return {"params": P}


def port_multiscale_discriminator(sd, num_D=2, n_layers=3) -> dict:
    """MultiscaleDiscriminator with getIntermFeat layer names
    ('scale{i}_layer{j}.0', networks.py:375-380) -> flax params."""
    sd = _to_np(sd)
    P = {}
    for i in range(num_D):
        scale = {}
        for j in range(n_layers + 2):
            scale[f"conv{j}"] = _conv(sd, f"scale{i}_layer{j}.0")
        P[f"scale{i}"] = scale
    return {"params": P}


def port_maskrcnn(sd, stage_sizes=(3, 4, 23, 3)) -> dict:
    """Reference Mask R-CNN state_dict (maskrcnn/model.py MaskRCNN:
    mask_rcnn_{name}_{epoch}.pth) -> flax MaskRCNN variables.

    Reference module layout (model.py:1419-1486): fpn.C1 is a Sequential
    [conv7x7, bn, relu, SamePad, maxpool]; fpn.C2..C5 are Sequentials of
    Bottlenecks (conv1/bn1..conv3/bn3, downsample.0/.1); fpn.P{k}_conv1
    are 1x1 convs and fpn.P{k}_conv2 Sequentials [SamePad, conv3x3];
    heads are rpn.conv_*, classifier.{conv,bn,linear}_*, mask.conv1..5 /
    bn1..4 / deconv."""
    sd = _to_np(sd)
    P: dict = {"fpn": {"resnet": {}}, "rpn": {}, "classifier": {},
               "mask": {}}
    S: dict = {"fpn": {"resnet": {}}, "classifier": {}, "mask": {}}
    res_P = P["fpn"]["resnet"]
    res_S = S["fpn"]["resnet"]

    res_P["conv1"] = _conv(sd, "fpn.C1.0")
    res_P["bn1"], res_S["bn1"] = _bn(sd, "fpn.C1.1")
    for s, blocks in enumerate(stage_sizes):
        for j in range(blocks):
            src = f"fpn.C{s + 2}.{j}"
            dst = f"C{s + 2}_{j}"
            blk, bst = {}, {}
            for k in range(1, 4):
                blk[f"conv{k}"] = _conv(sd, f"{src}.conv{k}")
                blk[f"bn{k}"], bst[f"bn{k}"] = _bn(sd, f"{src}.bn{k}")
            if f"{src}.downsample.0.weight" in sd:
                blk["downsample_conv"] = _conv(sd, f"{src}.downsample.0")
                blk["downsample_bn"], bst["downsample_bn"] = _bn(
                    sd, f"{src}.downsample.1")
            res_P[dst] = blk
            res_S[dst] = bst

    for k in range(2, 6):
        P["fpn"][f"P{k}_conv1"] = _conv(sd, f"fpn.P{k}_conv1")
        P["fpn"][f"P{k}_conv2"] = _conv(sd, f"fpn.P{k}_conv2.1")

    for n in ("conv_shared", "conv_class", "conv_bbox"):
        P["rpn"][n] = _conv(sd, f"rpn.{n}")

    for k in (1, 2):
        P["classifier"][f"conv{k}"] = _conv(sd, f"classifier.conv{k}")
        (P["classifier"][f"bn{k}"],
         S["classifier"][f"bn{k}"]) = _bn(sd, f"classifier.bn{k}")
    P["classifier"]["linear_class"] = _linear(sd, "classifier.linear_class")
    P["classifier"]["linear_bbox"] = _linear(sd, "classifier.linear_bbox")

    for k in range(1, 5):
        P["mask"][f"conv{k}"] = _conv(sd, f"mask.conv{k}")
        P["mask"][f"bn{k}"], S["mask"][f"bn{k}"] = _bn(sd, f"mask.bn{k}")
    P["mask"]["deconv"] = _convT(sd, "mask.deconv")
    P["mask"]["conv5"] = _conv(sd, "mask.conv5")

    return {"params": P, "batch_stats": S}


# ---------------------------------------------------------------------------
# VGG feature extractors (perceptual loss + LPIPS)
# ---------------------------------------------------------------------------

def port_vgg19(sd) -> dict:
    """torchvision vgg19 state_dict -> Vgg19Features variables.

    Only the conv layers up to relu5_1 (features.0 .. features.30) are
    used (textural/models/networks.py:467-486).  Keys may be the full
    torchvision dict ('features.N.weight') or already stripped."""
    sd = _to_np(sd)
    # torchvision vgg19 conv layer indices within .features
    conv_feature_idx = [0, 2, 5, 7, 10, 12, 14, 16,
                        19, 21, 23, 25, 28, 30, 32, 34]
    P = {}
    for conv_idx, feat_idx in enumerate(conv_feature_idx):
        key = f"features.{feat_idx}.weight"
        if key not in sd and f"{feat_idx}.weight" in sd:
            key = f"{feat_idx}.weight"
        if key not in sd:
            break          # only the tapped prefix is required
        name = key[:-len(".weight")]
        P[f"conv{conv_idx}"] = _conv(sd, name)
    return {"params": P}


def port_lpips(sd) -> dict:
    """Official `lpips` package checkpoint (vgg variant) -> LPIPS variables.

    Layout: 'net.slice{k}.{i}.weight' torchvision vgg16 convs (or a plain
    torchvision vgg16 'features.N.*' dict passed as `sd['net']`), plus
    'lin{k}.model.1.weight' [1, C, 1, 1] non-negative linear heads."""
    sd = _to_np(sd)
    # map flat vgg16 conv index -> torchvision features index
    conv_feature_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    P = {"net": {}}
    for conv_idx, feat_idx in enumerate(conv_feature_idx):
        for pat in (f"net.features.{feat_idx}", f"features.{feat_idx}",
                    f"net.{feat_idx}"):
            if f"{pat}.weight" in sd:
                P["net"][f"conv{conv_idx}"] = _conv(sd, pat)
                break
        else:
            # official checkpoints store slices: net.slice{s}.{feat_idx}
            s = 1 + sum(feat_idx >= b for b in (4, 9, 16, 23))
            pat = f"net.slice{s}.{feat_idx}"
            if f"{pat}.weight" in sd:
                P["net"][f"conv{conv_idx}"] = _conv(sd, pat)
    for k in range(5):
        key = f"lin{k}.model.1.weight"
        if key in sd:
            P[f"lin{k}"] = np.asarray(sd[key]).reshape(-1)
    return {"params": P}
