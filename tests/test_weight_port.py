"""Weight-port parity: the reference torch models (random weights, eval
mode) must produce the same outputs as the flax models after conversion.

The reference modules are imported directly from /root/reference (read-only)
as test oracles; SynchronizedBatchNorm2d is substituted with BatchNorm2d
(identical eval-mode math)."""

import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")


def _install_syncbn_stub():
    libnn = types.ModuleType("lib.nn")
    libnn.SynchronizedBatchNorm2d = torch.nn.BatchNorm2d
    lib = types.ModuleType("lib")
    lib.nn = libnn
    sys.modules.setdefault("lib", lib)
    sys.modules.setdefault("lib.nn", libnn)


def _randomize_bn_stats(module, rng):
    """Give BN layers non-trivial running stats so parity actually tests
    the stats port."""
    for m in module.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.copy_(torch.tensor(
                rng.randn(m.num_features).astype(np.float32)) * 0.1)
            m.running_var.copy_(torch.tensor(
                1.0 + 0.1 * rng.rand(m.num_features).astype(np.float32)))


def test_semantic_port_parity():
    _install_syncbn_stub()
    sys.path.insert(0, "/root/reference/semantic")
    import resnet as ref_resnet
    import models as ref_models

    torch.manual_seed(0)
    rng = np.random.RandomState(0)
    enc = ref_models.ResnetDilated(ref_resnet.resnet50(pretrained=False),
                                   dilate_scale=8)
    dec = ref_models.PPMBilinearDeepsup(num_class=14, fc_dim=2048,
                                        use_softmax=True)
    with torch.no_grad():
        _randomize_bn_stats(enc, rng)
        _randomize_bn_stats(dec, rng)
    enc.eval()
    dec.eval()

    x = torch.randn(1, 3, 64, 96)
    with torch.no_grad():
        fm = enc(x, return_feature_maps=True)
        ref_out = dec(fm, segSize=(64, 96)).numpy()      # [1, C, H, W]

    from sdn3d_tpu.models.semantic import SemanticModel
    from sdn3d_tpu.utils.port import port_semantic
    variables = port_semantic(enc.state_dict(), dec.state_dict())
    model = SemanticModel(num_class=14)
    out = model.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
        seg_size=(64, 96), train=False)
    got = np.asarray(out).transpose(0, 3, 1, 2)

    np.testing.assert_allclose(got, ref_out, atol=2e-4, rtol=1e-3)


def _torch_basic_block(inp, out, stride=1):
    """torchvision BasicBlock replica (stride on the first 3x3)."""
    class Block(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = torch.nn.Conv2d(inp, out, 3, stride, 1, bias=False)
            self.bn1 = torch.nn.BatchNorm2d(out)
            self.conv2 = torch.nn.Conv2d(out, out, 3, 1, 1, bias=False)
            self.bn2 = torch.nn.BatchNorm2d(out)
            self.downsample = None
            if stride != 1 or inp != out:
                self.downsample = torch.nn.Sequential(
                    torch.nn.Conv2d(inp, out, 1, stride, bias=False),
                    torch.nn.BatchNorm2d(out))

        def forward(self, x):
            r = x if self.downsample is None else self.downsample(x)
            y = torch.relu(self.bn1(self.conv1(x)))
            y = self.bn2(self.conv2(y))
            return torch.relu(y + r)

    return Block()


class _TorchResnet18Feature(torch.nn.Module):
    """torchvision resnet18 + fc->256 replica with torchvision state_dict
    names (the derenderer trunk, derender3d/models/derenderer.py:28-30;
    torchvision itself is not installed in this image)."""

    def __init__(self, num_out=256):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(64)
        self.maxpool = torch.nn.MaxPool2d(3, 2, 1)
        chans = [64, 64, 128, 256, 512]
        for i in range(1, 5):
            setattr(self, f"layer{i}", torch.nn.Sequential(
                _torch_basic_block(chans[i - 1], chans[i],
                                   1 if i == 1 else 2),
                _torch_basic_block(chans[i], chans[i], 1)))
        self.fc = torch.nn.Linear(512, num_out)

    def forward(self, x):
        x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
        for i in range(1, 5):
            x = getattr(self, f"layer{i}")(x)
        x = x.mean(dim=(2, 3))
        return self.fc(x)


class _TorchDerenderer(torch.nn.Module):
    """Reference Derenderer replica (derenderer.py:7-65)."""

    def __init__(self, num_classes=8, grid_size=4, hidden=256):
        super().__init__()
        self.num_classes = num_classes
        self.grid_size = grid_size
        self.out_sizes = [2, 2, 3, 1, num_classes,
                          num_classes * grid_size ** 3 * 3]
        self.net = _TorchResnet18Feature(hidden)
        self.fc1 = torch.nn.Linear(hidden + 4, hidden)
        self.fc2 = torch.nn.Linear(hidden, hidden)
        self._fc3 = torch.nn.Linear(hidden, sum(self.out_sizes))

    def forward(self, images, mroi, droi):
        x = torch.relu(self.net(images))
        x = torch.cat([x, mroi, droi], dim=1)
        x = torch.relu(self.fc1(x))
        x = torch.relu(self.fc2(x))
        x = self._fc3(x)
        td, t2, ls, ld, cp, ffd = torch.split(x, self.out_sizes, dim=1)
        td = td / td.norm(p=2, dim=1, keepdim=True)
        cp = torch.nn.functional.softmax(cp, dim=1)
        ffd = ffd.view(-1, self.num_classes, self.grid_size ** 3 * 3)
        return {"_theta_deltas": td, "_translation2ds": t2,
                "_log_scales": ls, "_log_depths": ld, "_class_probs": cp,
                "_ffd_coeffs": ffd}


def test_derenderer_port_parity():
    torch.manual_seed(1)
    ref = _TorchDerenderer()
    rng = np.random.RandomState(1)
    with torch.no_grad():
        _randomize_bn_stats(ref, rng)
    ref.eval()

    x = torch.randn(2, 3, 64, 64)
    mroi = torch.randn(2, 2)
    droi = torch.rand(2, 2) + 0.2
    with torch.no_grad():
        ref_out = ref(x, mroi, droi)

    from sdn3d_tpu.models.derenderer import Derenderer
    from sdn3d_tpu.utils.port import port_derenderer
    variables = port_derenderer(ref.state_dict())
    model = Derenderer(num_classes=8)
    got = model.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(mroi.numpy()), jnp.asarray(droi.numpy()),
        train=False)

    for key in ["_theta_deltas", "_translation2ds", "_log_scales",
                "_log_depths", "_class_probs"]:
        np.testing.assert_allclose(
            np.asarray(got[key]), ref_out[key].numpy(), atol=2e-4,
            rtol=1e-3, err_msg=key)
    np.testing.assert_allclose(
        np.asarray(got["_ffd_coeffs"]),
        ref_out["_ffd_coeffs"].numpy(), atol=2e-4, rtol=1e-3)


def _import_ref_networks():
    """Import textural/models/networks.py with a torchvision stub (the
    image has torch but not torchvision; only Vgg19 needs it)."""
    tv = types.ModuleType("torchvision")
    tv.models = types.ModuleType("torchvision.models")
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.models", tv.models)
    sys.path.insert(0, "/root/reference/textural/models")
    import networks as ref_networks
    return ref_networks


def test_pix2pixhd_generator_port_parity():
    import functools
    ref_networks = _import_ref_networks()

    torch.manual_seed(2)
    norm = functools.partial(torch.nn.InstanceNorm2d, affine=False)
    ref = ref_networks.GlobalGenerator(7, 3, ngf=16, n_downsampling=2,
                                       n_blocks=3, norm_layer=norm)
    ref.eval()
    x = torch.randn(1, 7, 64, 96)
    with torch.no_grad():
        ref_out = ref(x).numpy()

    from sdn3d_tpu.models.pix2pixhd import GlobalGenerator
    from sdn3d_tpu.utils.port import port_global_generator
    variables = port_global_generator(ref.state_dict(), ngf=16,
                                      n_downsampling=2, n_blocks=3)
    model = GlobalGenerator(output_nc=3, ngf=16, n_downsampling=2, n_blocks=3)
    got = model.apply(variables, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, ref_out, atol=2e-4, rtol=1e-3)


def test_pix2pixhd_encoder_port_parity():
    import functools
    ref_networks = _import_ref_networks()

    torch.manual_seed(3)
    norm = functools.partial(torch.nn.InstanceNorm2d, affine=False)
    ref = ref_networks.Encoder(4, 5, ngf=8, n_downsampling=2,
                               norm_layer=norm)
    ref.eval()
    x = torch.randn(1, 4, 64, 96)
    with torch.no_grad():
        ref_out = ref.model(x).numpy()

    from sdn3d_tpu.models.pix2pixhd import Encoder
    from sdn3d_tpu.utils.port import port_encoder
    variables = port_encoder(ref.state_dict(), n_downsampling=2)
    model = Encoder(feat_num=5, nef=8, n_downsampling=2)
    got = model.apply(variables, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, ref_out, atol=2e-4, rtol=1e-3)


def test_pix2pixhd_discriminator_port_parity():
    import functools
    ref_networks = _import_ref_networks()

    torch.manual_seed(4)
    norm = functools.partial(torch.nn.InstanceNorm2d, affine=False)
    ref = ref_networks.MultiscaleDiscriminator(
        10, ndf=8, n_layers=3, norm_layer=norm, num_D=2, getIntermFeat=True)
    ref.eval()
    x = torch.randn(1, 10, 64, 96)
    with torch.no_grad():
        ref_out = ref(x)

    from sdn3d_tpu.models.pix2pixhd import MultiscaleDiscriminator
    from sdn3d_tpu.utils.port import port_multiscale_discriminator
    variables = port_multiscale_discriminator(ref.state_dict(), num_D=2,
                                              n_layers=3)
    model = MultiscaleDiscriminator(ndf=8, n_layers=3, num_D=2)
    got = model.apply(variables, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))

    assert len(got) == len(ref_out) == 2
    for scale_got, scale_ref in zip(got, ref_out):
        assert len(scale_got) == len(scale_ref)
        # compare the final prediction map of each scale
        np.testing.assert_allclose(
            np.asarray(scale_got[-1]).transpose(0, 3, 1, 2),
            scale_ref[-1].numpy(), atol=2e-4, rtol=1e-3)


def _install_maskrcnn_stubs():
    """Stub the compiled CUDA extensions (nms/roialign), skimage, and the
    matplotlib-heavy visualize module so the reference maskrcnn/model.py
    imports on this machine."""
    def mod(name, **attrs):
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules.setdefault(name, m)
        return m

    mod("nms")
    mod("nms.nms_wrapper", nms=lambda *a, **k: None)
    mod("roialign")
    mod("roialign.roi_align")
    mod("roialign.roi_align.crop_and_resize",
        CropAndResizeFunction=object)
    sk = mod("skimage")
    sk.color = mod("skimage.color")
    sk.io = mod("skimage.io")
    sk.transform = mod("skimage.transform")
    mod("visualize")


def test_maskrcnn_port_parity(tmp_path):
    """Reference MaskRCNN state_dict -> flax MaskRCNN: FPN pyramid and RPN
    head outputs must match (random weights, randomized BN stats, eval
    mode).  Heads (classifier/mask) are ported by the same name map; their
    ROI-align inputs differ in implementation so the backbone+RPN parity
    is the port's integration check."""
    _install_maskrcnn_stubs()
    sys.path.insert(0, "/root/reference/geometric/maskrcnn")
    import importlib
    import model as ref_model

    import jax
    import jax.numpy as jnp
    from sdn3d_tpu.models.maskrcnn import FPN, RPNHead, MaskRCNNConfig
    from sdn3d_tpu.utils.port import port_maskrcnn

    import config as ref_config

    class _Cfg(ref_config.Config):
        NAME = "parity"
        GPU_COUNT = 0          # skip .cuda() on the anchors (model.py:1466)

    cfg = _Cfg()

    torch.manual_seed(0)
    rng = np.random.RandomState(0)
    net = ref_model.MaskRCNN(cfg, str(tmp_path))
    with torch.no_grad():
        _randomize_bn_stats(net, rng)
        # non-trivial weights (reference init leaves some at kaiming/zeros)
        for p in net.parameters():
            p.add_(torch.tensor(
                0.05 * rng.randn(*p.shape).astype(np.float32)))
    net.eval()

    x = torch.randn(1, 128, 128, 3).permute(0, 3, 1, 2)
    with torch.no_grad():
        p2, p3, p4, p5, p6 = net.fpn(x)
        rpn_logits, rpn_probs, rpn_bbox = net.rpn(p2)

    variables = port_maskrcnn(net.state_dict())
    fpn = FPN(out_channels=256, stage_sizes=(3, 4, 23, 3))
    xj = jnp.asarray(x.permute(0, 2, 3, 1).numpy())
    outs = fpn.apply({"params": variables["params"]["fpn"],
                      "batch_stats": variables["batch_stats"]["fpn"]},
                     xj, train=False)
    def assert_close_rel(a, b, name, tol=2e-3):
        # random resnet101 weights blow activations up to ~1e16, so
        # compare relative to the output scale
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max() + 1e-12
        err = np.abs(a - b).max() / scale
        assert err < tol, (name, err, scale)

    for ref, ours, name in [(p2, outs[0], "p2"), (p3, outs[1], "p3"),
                            (p4, outs[2], "p4"), (p5, outs[3], "p5"),
                            (p6, outs[4], "p6")]:
        assert_close_rel(ours, ref.numpy().transpose(0, 2, 3, 1), name)

    rpn = RPNHead(anchors_per_location=len(cfg.RPN_ANCHOR_RATIOS),
                  anchor_stride=cfg.RPN_ANCHOR_STRIDE)
    logits_j, _, bbox_j = rpn.apply(
        {"params": variables["params"]["rpn"]}, outs[0])
    assert_close_rel(np.asarray(logits_j).reshape(-1, 2),
                     rpn_logits.numpy().reshape(-1, 2), "rpn_logits")
    assert_close_rel(np.asarray(bbox_j).reshape(-1, 4),
                     rpn_bbox.numpy().reshape(-1, 4), "rpn_bbox")
