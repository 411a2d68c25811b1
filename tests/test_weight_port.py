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


# ---------------------------------------------------------------------------
# Full detect() parity: backbone -> RPN -> proposals -> ROI heads ->
# refine_detections -> mask head, reference torch vs ported flax
# ---------------------------------------------------------------------------

def _np_nms(dets: np.ndarray, threshold: float) -> np.ndarray:
    """Greedy NMS with the reference CUDA kernel's devIoU semantics
    (+1 inclusive areas, nms/src/cuda/nms_kernel.cu): numpy transcription
    used as a functional stub for the torch reference."""
    y1, x1, y2, x2, scores = dets.T
    areas = (y2 - y1 + 1) * (x2 - x1 + 1)
    order = scores.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(i)
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        iou = w * h / (areas[i] + areas[order[1:]] - w * h)
        order = order[1:][iou <= threshold]
    return np.asarray(keep, np.int64)


def _np_crop_and_resize(image: np.ndarray, boxes: np.ndarray,
                        box_ind: np.ndarray, ph: int, pw: int) -> np.ndarray:
    """tf.crop_and_resize bilinear semantics (corner-aligned): numpy
    transcription stubbing roialign CropAndResizeFunction.
    image [B, C, H, W]; boxes [N, 4] normalized y1,x1,y2,x2.

    Sample coordinates are computed in float32 like the reference CUDA
    kernel (crop_and_resize_kernel.cu:28-44) — at a box edge landing
    exactly on H-1, float32 rounding decides between interpolating the
    last row and extrapolating 0, so float64 here would diverge."""
    B, C, H, W = image.shape
    N = boxes.shape[0]
    out = np.zeros((N, C, ph, pw), np.float32)
    f32 = np.float32
    for n in range(N):
        yy1, xx1, yy2, xx2 = boxes[n].astype(f32)
        b = int(box_ind[n])
        hs = f32(f32(f32(yy2 - yy1) * f32(H - 1)) / f32(max(ph - 1, 1)))
        ws = f32(f32(f32(xx2 - xx1) * f32(W - 1)) / f32(max(pw - 1, 1)))
        ys = (f32(yy1 * f32(H - 1))
              + np.arange(ph, dtype=f32) * hs).astype(f32)
        xs = (f32(xx1 * f32(W - 1))
              + np.arange(pw, dtype=f32) * ws).astype(f32)
        y0 = np.clip(np.floor(ys).astype(int), 0, H - 1)
        y1i = np.clip(y0 + 1, 0, H - 1)
        x0 = np.clip(np.floor(xs).astype(int), 0, W - 1)
        x1i = np.clip(x0 + 1, 0, W - 1)
        wy = np.clip(ys - y0, 0.0, 1.0)
        wx = np.clip(xs - x0, 0.0, 1.0)
        # out-of-bounds sample points -> extrapolation value 0
        oob_y = (ys < 0) | (ys > H - 1)
        oob_x = (xs < 0) | (xs > W - 1)
        for c in range(C):
            img = image[b, c]
            top = img[y0][:, x0] * (1 - wx) + img[y0][:, x1i] * wx
            bot = img[y1i][:, x0] * (1 - wx) + img[y1i][:, x1i] * wx
            val = top * (1 - wy[:, None]) + bot * wy[:, None]
            val[oob_y, :] = 0.0
            val[:, oob_x] = 0.0
            out[n, c] = val
    return out


@pytest.mark.slow
def test_maskrcnn_full_detect_parity(tmp_path, monkeypatch):
    """Reference MaskRCNN.detect() (CUDA ops replaced by independent numpy
    transcriptions) vs the ported flax MaskRCNNDetector.detect(): final
    class ids and boxes must agree (model.py:1610-1660, 1705-1821,
    refine_detections :744-828)."""
    _install_maskrcnn_stubs()
    sys.path.insert(0, "/root/reference/geometric/maskrcnn")
    import model as ref_model
    import config as ref_config

    from sdn3d_tpu.models.maskrcnn import MaskRCNNConfig
    from sdn3d_tpu.pipelines.detect import MaskRCNNDetector
    from sdn3d_tpu.utils.port import port_maskrcnn

    # functional stubs (model.py binds them as module globals)
    def nms_stub(dets, threshold):
        keep = _np_nms(dets.detach().cpu().numpy(), float(threshold))
        return torch.from_numpy(keep)

    class CropAndResizeStub:
        def __init__(self, ph, pw, extrapolation_value=0):
            self.ph, self.pw = ph, pw

        def __call__(self, image, boxes, box_ind):
            out = _np_crop_and_resize(
                image.detach().cpu().numpy(),
                boxes.detach().cpu().numpy(),
                box_ind.detach().cpu().numpy(), self.ph, self.pw)
            return torch.from_numpy(out)

    monkeypatch.setattr(ref_model, "nms", nms_stub)
    monkeypatch.setattr(ref_model, "CropAndResizeFunction", CropAndResizeStub)

    # scipy.misc.imresize was removed from scipy; transcribe the OLD scipy
    # semantics the reference relies on (float input -> min/max bytescale
    # to 0..255, PIL bilinear, uint8 out) for utils.resize_image /
    # unmold_mask (utils.py:307,388).
    import utils as ref_utils

    def _imresize(arr, size, interp="bilinear"):
        from PIL import Image as PILImage
        arr = np.asarray(arr)
        if arr.dtype != np.uint8:
            lo, hi = float(arr.min()), float(arr.max())
            scale = 255.0 / (hi - lo) if hi > lo else 1.0
            arr = ((arr - lo) * scale).astype(np.uint8)
        h, w = size
        mode = PILImage.BILINEAR if interp == "bilinear" else PILImage.NEAREST
        img = PILImage.fromarray(arr)
        return np.asarray(img.resize((int(w), int(h)), mode))

    monkeypatch.setattr(ref_utils.scipy.misc, "imresize", _imresize,
                        raising=False)

    class _Cfg(ref_config.Config):
        NAME = "detect_parity"
        GPU_COUNT = 0
        IMAGES_PER_GPU = 1
        NUM_CLASSES = 3
        IMAGE_MIN_DIM = 128
        IMAGE_MAX_DIM = 128
        RPN_ANCHOR_SCALES = (8, 16, 32, 64, 128)
        POST_NMS_ROIS_INFERENCE = 100
        DETECTION_MIN_CONFIDENCE = 0.0
        DETECTION_MAX_INSTANCES = 10

    cfg = _Cfg()

    torch.manual_seed(0)
    rng = np.random.RandomState(0)
    net = ref_model.MaskRCNN(cfg, str(tmp_path))
    with torch.no_grad():
        _randomize_bn_stats(net, rng)
        for p in net.parameters():
            p.add_(torch.tensor(
                0.05 * rng.randn(*p.shape).astype(np.float32)))

    image = (rng.rand(128, 128, 3) * 255).astype(np.uint8)
    image[40:90, 30:100] = [220, 40, 40]        # a blob to detect

    # Whiten BN running stats with a momentum=1 train-mode probe: with
    # purely random weights, eval-mode BN (running stats, not batch stats)
    # lets resnet101 activations compound to ~1e16, which overflows the
    # exp() in the box deltas and NaNs every detection.  After the probe,
    # each BN's running stats equal its input's batch stats on this image,
    # so eval activations stay O(1) — and the port copies these stats.
    for m in net.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.momentum = 1.0
    net.train()
    molded, _, _ = net.mold_inputs([image])
    xt = torch.from_numpy(molded.transpose(0, 3, 1, 2)).float()
    probe_rois = torch.tensor([[0.05, 0.05, 0.55, 0.5],
                               [0.3, 0.2, 0.9, 0.9],
                               [0.1, 0.4, 0.7, 0.95],
                               [0.0, 0.0, 1.0, 1.0]])
    with torch.no_grad():
        p2, p3, p4, p5, _ = net.fpn(xt)
        net.classifier([p2, p3, p4, p5], probe_rois)
        net.mask([p2, p3, p4, p5], probe_rois)
    net.eval()

    ours = MaskRCNNDetector(MaskRCNNConfig(
        num_classes=3, image_min_dim=128, image_max_dim=128,
        rpn_anchor_scales=(8, 16, 32, 64, 128),
        post_nms_rois_inference=100,
        detection_min_confidence=0.0, detection_max_instances=10))
    mcfg = ours.config
    variables = port_maskrcnn(net.state_dict())

    # --- chained-stage parity on IDENTICAL inputs ------------------------
    # With random weights, RPN scores are near-tied; float-accumulation
    # noise through 100 resnet convs (~3e-4 rel on the FPN maps) flips
    # top-k/NMS orderings, so end-to-end argmax equality is not numerically
    # well-posed.  Instead every stage of detect() is compared on the same
    # inputs (the reference stage's own inputs), which pins the box math,
    # NMS semantics, crop/resize semantics, head ports and refine logic
    # exactly (model.py:344-407, 414-502, 744-838, 920-1020).
    from sdn3d_tpu.models import maskrcnn as MM

    with torch.no_grad():
        feats = net.fpn(xt)
        layer_outputs = [net.rpn(p) for p in feats]
        outputs = list(zip(*layer_outputs))
        _, rpn_class, rpn_bbox = [torch.cat(list(o), dim=1)
                                  for o in outputs]
        # sanitize the random-weight RPN outputs identically for both
        # sides: break softmax-saturation score ties with a deterministic
        # per-anchor jitter (tied scores make top-k order framework-
        # dependent) and clip deltas so exp() stays finite.
        A = rpn_class.shape[1]
        # steps must exceed float32 eps at 1.0 (saturated probs)
        jitter = torch.arange(A, dtype=torch.float32)[None] * 1e-6
        rpn_class = torch.stack([rpn_class[:, :, 0] - jitter,
                                 rpn_class[:, :, 1] + jitter], dim=2)
        rpn_bbox = rpn_bbox.clamp(-4.0, 4.0)
        ref_rois_n = ref_model.proposal_layer(
            [rpn_class, rpn_bbox],
            proposal_count=cfg.POST_NMS_ROIS_INFERENCE,
            nms_threshold=cfg.RPN_NMS_THRESHOLD,
            anchors=net.anchors, config=cfg)       # [1, P, 4] normalized
        mrcnn_maps = [p.numpy().transpose(0, 2, 3, 1) for p in feats[:4]]
        _, ref_probs, ref_deltas = net.classifier(list(feats[:4]),
                                                  ref_rois_n)
        ref_rois_n = ref_rois_n.squeeze(0)
        ref_dets = ref_model.refine_detections(
            ref_rois_n, ref_probs, ref_deltas,
            np.array([0, 0, 128, 128]), cfg)            # [D, 6] pixels
        ref_mask_boxes = ref_dets[:, :4] / torch.tensor(
            [128.0, 128.0, 128.0, 128.0])
        ref_masks = net.mask(list(feats[:4]),
                             ref_mask_boxes.unsqueeze(0))  # [D, C, mh, mw]

    # 1) proposal_layer on the reference's own RPN outputs
    props_j, props_valid = MM.proposal_layer(
        jnp.asarray(rpn_class[0].numpy()), jnp.asarray(rpn_bbox[0].numpy()),
        jnp.asarray(ours.anchors), mcfg, mcfg.post_nms_rois_inference)
    got_props = np.asarray(props_j)[np.asarray(props_valid)]
    want_props = ref_rois_n.numpy()
    n = min(len(got_props), len(want_props))
    assert n >= 10, (len(got_props), len(want_props))
    np.testing.assert_allclose(got_props[:n], want_props[:n],
                               atol=2e-5)

    # 2) classifier heads (pyramid ROI align + convs) on the reference's
    #    proposals and feature maps
    rois_j = jnp.asarray(ref_rois_n.numpy())
    maps_j = [jnp.asarray(m) for m in mrcnn_maps]
    cls = MM.Classifier(pool_size=mcfg.pool_size,
                        num_classes=3, image_shape=mcfg.image_shape)
    _, probs_j, deltas_j = cls.apply(
        {"params": variables["params"]["classifier"],
         "batch_stats": variables["batch_stats"]["classifier"]},
        maps_j, rois_j, train=False)
    np.testing.assert_allclose(np.asarray(probs_j), ref_probs.numpy(),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(deltas_j), ref_deltas.numpy(),
                               atol=5e-3)

    # 3) refine_detections on the reference's rois/probs/deltas
    dets_j, det_valid = MM.refine_detections(
        rois_j, jnp.asarray(ref_probs.numpy()),
        jnp.asarray(ref_deltas.numpy()), (0.0, 0.0, 128.0, 128.0),
        jnp.ones((rois_j.shape[0],), bool), mcfg)
    got_dets = np.asarray(dets_j)[np.asarray(det_valid)]
    want_dets = ref_dets.numpy()
    assert len(want_dets) > 0, "reference produced no detections"
    assert len(got_dets) == len(want_dets), (got_dets, want_dets)
    np.testing.assert_allclose(got_dets[:, :5], want_dets[:, :5], atol=1e-3)
    np.testing.assert_allclose(got_dets[:, 5], want_dets[:, 5], atol=2e-3)

    # 4) mask head on the reference's detection boxes
    mh = MM.MaskHead(pool_size=mcfg.mask_pool_size, num_classes=3,
                     image_shape=mcfg.image_shape)
    masks_j = mh.apply(
        {"params": variables["params"]["mask"],
         "batch_stats": variables["batch_stats"]["mask"]},
        maps_j, jnp.asarray(ref_mask_boxes.numpy()), train=False)
    np.testing.assert_allclose(
        np.asarray(masks_j),
        ref_masks.numpy().transpose(0, 2, 3, 1), atol=5e-3)

    # --- end-to-end smoke: both full detect() paths produce detections of
    # the same classes on this image (box identity is order-fragile under
    # random weights; the stage chain above pins the math) ---------------
    with torch.no_grad():
        ref_out = net.detect([image])[0]
    class_ids, masks, rois = ours.detect(variables, image)
    assert len(ref_out["class_ids"]) > 0 and len(class_ids) > 0
    assert set(np.unique(class_ids)) == set(np.unique(ref_out["class_ids"]))


@pytest.mark.slow
def test_semantic_multiscale_port_parity():
    """End-to-end multi-scale inference parity: the full protocol
    (per-scale long-edge-capped resize to CEIL-x8 dims -> segment ->
    upsample to segSize -> average -> argmax; vkitti_dataset.py:213-221 +
    vkitti_test.py:46-79) against the reference modules with ported
    weights.  Both sides consume the SAME resized inputs
    (jax.image.resize) — resize-kernel differences (scipy imresize) are a
    data-prep, not a model-port, concern."""
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

    from sdn3d_tpu.models.semantic import SemanticModel
    from sdn3d_tpu.pipelines.semantic import multiscale_inference
    from sdn3d_tpu.utils.port import port_semantic

    variables = port_semantic(enc.state_dict(), dec.state_dict())
    model = SemanticModel(num_class=14)

    H, W = 48, 64
    image = rng.rand(H, W, 3).astype(np.float32) * 2 - 1
    scales = (24, 32, 48)

    # reference protocol over the same per-scale inputs
    from sdn3d_tpu.data.semantic_data import (IMG_MAX_SIZE_EVAL,
                                              round2nearest_multiple)
    ref_pred = torch.zeros(1, 14, H, W)
    for s in scales:
        scale = min(s / min(H, W), IMG_MAX_SIZE_EVAL / max(H, W))
        nh8 = round2nearest_multiple(int(H * scale), 8)
        nw8 = round2nearest_multiple(int(W * scale), 8)
        x = np.asarray(jax.image.resize(jnp.asarray(image), (nh8, nw8, 3),
                                        method="bilinear"))
        xt = torch.from_numpy(x.transpose(2, 0, 1)[None])
        with torch.no_grad():
            fm = enc(xt, return_feature_maps=True)
            ref_pred += dec(fm, segSize=(H, W)) / len(scales)
    ref_probs = ref_pred[0].numpy().transpose(1, 2, 0)

    got = multiscale_inference(variables, model, image, scales=scales)
    np.testing.assert_allclose(got, ref_probs, atol=5e-4, rtol=2e-3)
    # label parity where the decision is numerically meaningful: random
    # weights give near-uniform probs, so argmax may flip where the top-2
    # margin is inside float noise.
    srt = np.sort(ref_probs, axis=-1)
    margin = srt[..., -1] - srt[..., -2]
    decided = margin > 1e-3
    assert decided.mean() > 0.5, "degenerate case: nothing decided"
    np.testing.assert_array_equal(got.argmax(-1)[decided],
                                  ref_probs.argmax(-1)[decided])
