"""Fused single-process chain (pipelines/chain.py) parity tests.

The fused mode must be byte-identical to driving the three per-stage
CLIs through the filesystem contract (the PNG round-trip it removes is
lossless) — asserted end-to-end on a real on-disk VKITTI fixture with
identical (seed-0 random) weights in both paths.
"""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

SHAPENET = "/root/reference/geometric/assets"

# two edit pairs SHARING a source frame (covers the per-source
# transform/feature cache-hit path in both chain modes) + their
# reconstruction twins (second half of the benchmark JSON structure)
ITEMS = [
    {"world": "0006", "topic": "fog", "source": "00055",
     "target": "00050",
     "operations": [
         {"type": "modify", "from": {"u": "750.9", "v": "213.9"},
          "to": {"u": "804.4", "v": "227.1",
                 "roi": [194, 756, 269, 865]},
          "zoom": "1.338", "ry": "0.007"},
         {"type": "delete", "from": {"u": "300.0", "v": "200.0"},
          "to": None, "zoom": None, "ry": None}]},
    {"world": "0006", "topic": "fog", "source": "00055",
     "target": "00060",
     "operations": [
         {"type": "modify", "from": {"u": "750.9", "v": "213.9"},
          "to": {"u": "650.0", "v": "210.0",
                 "roi": [190, 600, 260, 700]},
          "zoom": "0.9", "ry": "0.4"}]},
    {"world": "0006", "topic": "fog", "source": "00055",
     "target": "00055", "operations": []},
    {"world": "0006", "topic": "fog", "source": "00060",
     "target": "00060", "operations": []},
]

# small-shape knobs shared by both paths (CPU-affordable)
SCALES = ["100"]
GEO = {"image_size": "64", "render_size": "64"}
TEX = {"load_size": "160", "fine_width": "160", "fine_height": "96"}


@pytest.fixture(scope="module")
def chain_env(tmp_path_factory):
    from make_vkitti_fixture import build_fixture

    work = tmp_path_factory.mktemp("chain")
    root = str(work / "vkitti")
    edit_json = str(work / "edit.json")
    with open(edit_json, "w") as f:
        json.dump(ITEMS, f)
    build_fixture(root, edit_json)
    return work, root, edit_json


@pytest.mark.quick
def test_chain_config_matches_cli_defaults():
    from sdn3d_tpu.cli.edit_benchmark import build_argparser as tex_ap
    from sdn3d_tpu.cli.geometric_main import build_argparser as geo_ap
    from sdn3d_tpu.cli.semantic_test import build_argparser as sem_ap
    from sdn3d_tpu.pipelines.chain import ChainConfig

    cfg = ChainConfig()
    geo = geo_ap().parse_args(["--edit_json", "x"])
    sem = sem_ap().parse_args(["--test_img", "x"])
    tex = tex_ap().parse_args(["--edit_json", "x", "--segm_dir", "x",
                               "--geo_dir", "x"])
    assert cfg.image_size == geo.image_size
    assert cfg.render_size == geo.render_size
    assert cfg.num_opts == geo.num_opts
    assert cfg.mode == geo.mode
    assert cfg.num_class == sem.num_class
    assert tuple(cfg.scales) == tuple(sem.scales)
    assert cfg.load_size == tex.load_size
    assert cfg.fine_width == tex.fine_width
    assert cfg.fine_height == tex.fine_height


@pytest.mark.slow
def test_fused_chain_matches_file_chain(chain_env):
    """EditChain == semantic_test -> geometric_main -> edit_benchmark."""
    from sdn3d_tpu.cli import edit_benchmark, geometric_main, semantic_test
    from sdn3d_tpu.cli.edit_chain import main as chain_main

    work, root, edit_json = chain_env
    segm_dir = str(work / "segm")
    geo_dir = str(work / "geo")
    tex_dir = str(work / "tex")
    fused_dir = str(work / "fused")
    dump_dir = str(work / "dump")

    # file-based 3-stage chain (benchmark protocol, scripts/benchmark_dryrun)
    semantic_test.main([
        "--test_img", "benchmark", "--edit_json", edit_json,
        "--data_root", root, "--result", segm_dir,
        "--scales", *SCALES])
    geo_json = str(work / "edits.json")
    with open(geo_json, "w") as f:
        json.dump(ITEMS[:2], f)
    geometric_main.main([
        "--do", "test", "--mode", "extend", "--source", "gt",
        "--vkitti_root", root, "--edit_json", geo_json,
        "--output_dir", geo_dir, "--shapenet_root", SHAPENET,
        "--image_size", GEO["image_size"],
        "--render_size", GEO["render_size"]])
    edit_benchmark.main([
        "--edit_json", edit_json, "--data_root", root,
        "--segm_dir", segm_dir, "--geo_dir", geo_dir,
        "--results_dir", tex_dir,
        "--load_size", TEX["load_size"],
        "--fine_width", TEX["fine_width"],
        "--fine_height", TEX["fine_height"]])

    # fused single-process chain, same shapes + same seed-0 weights
    chain_main([
        "--edit_json", edit_json, "--data_root", root,
        "--shapenet_root", SHAPENET, "--source", "gt",
        "--results_dir", fused_dir, "--dump_dirs", dump_dir,
        "--scales", *SCALES,
        "--image_size", GEO["image_size"],
        "--render_size", GEO["render_size"],
        "--load_size", TEX["load_size"],
        "--fine_width", TEX["fine_width"],
        "--fine_height", TEX["fine_height"]])

    with open(os.path.join(tex_dir, "benchmark.json")) as f:
        file_res = json.load(f)
    with open(os.path.join(fused_dir, "benchmark.json")) as f:
        fused_res = json.load(f)
    assert fused_res["pairs"] == file_res["pairs"] == 2
    # identical weights + identical (lossless) intermediates -> identical
    # metrics
    np.testing.assert_allclose(fused_res["mean_L1"], file_res["mean_L1"],
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(fused_res["mean_LPIPS"],
                               file_res["mean_LPIPS"], rtol=0, atol=1e-6)

    # the dumped file contract is byte-identical to the per-stage CLIs'
    name = "0006_fog_00055_00050"    # EditItem.target_name
    src_name = "0006_fog_00055"      # EditItem.source_name
    for fn, d in [(f"{src_name}.png", segm_dir)]:
        a = open(os.path.join(d, fn), "rb").read()
        b = open(os.path.join(dump_dir, "segm", fn), "rb").read()
        assert a == b, fn
    for suffix in [".png", "-normal.png", "-depth.png", ".json"]:
        a = open(os.path.join(geo_dir, f"{name}{suffix}"), "rb").read()
        b = open(os.path.join(dump_dir, "geo", f"{name}{suffix}"),
                 "rb").read()
        assert a == b, suffix

    # the OVERLAPPED mode may not fork the contract: --pipeline dumps
    # the identical bytes and identical metrics (VERDICT r3 item 8)
    fused_pipe_dir = str(work / "fused_pipe")
    dump_pipe_dir = str(work / "dump_pipe")
    chain_main([
        "--edit_json", edit_json, "--data_root", root,
        "--shapenet_root", SHAPENET, "--source", "gt",
        "--results_dir", fused_pipe_dir, "--dump_dirs", dump_pipe_dir,
        "--pipeline",
        "--scales", *SCALES,
        "--image_size", GEO["image_size"],
        "--render_size", GEO["render_size"],
        "--load_size", TEX["load_size"],
        "--fine_width", TEX["fine_width"],
        "--fine_height", TEX["fine_height"]])
    with open(os.path.join(fused_pipe_dir, "benchmark.json")) as f:
        pipe_res = json.load(f)
    assert pipe_res["pipelined"] is True
    np.testing.assert_allclose(pipe_res["mean_L1"], file_res["mean_L1"],
                               rtol=0, atol=1e-6)
    for fn, d in [(f"{src_name}.png", segm_dir)]:
        a = open(os.path.join(d, fn), "rb").read()
        b = open(os.path.join(dump_pipe_dir, "segm", fn), "rb").read()
        assert a == b, ("pipelined", fn)
    for suffix in [".png", "-normal.png", "-depth.png", ".json"]:
        a = open(os.path.join(geo_dir, f"{name}{suffix}"), "rb").read()
        b = open(os.path.join(dump_pipe_dir, "geo", f"{name}{suffix}"),
                 "rb").read()
        assert a == b, ("pipelined", suffix)


def test_source_cache_bounded_lru():
    """EditChain's per-source caches evict beyond cache_sources (a long
    streaming run must not pin every source's encode in host memory)."""
    from sdn3d_tpu.pipelines.chain import _SourceCache

    c = _SourceCache(2)
    c.put("a", 1)
    c.put("b", 2)
    assert c.get("a") == 1          # refreshes 'a'
    c.put("c", 3)                   # evicts 'b' (least recent)
    assert "b" not in c
    assert c.get("a") == 1 and c.get("c") == 3
    c.put("a", 9)                   # overwrite keeps size bounded
    assert c.get("a") == 9
    assert len(c._d) == 2


@pytest.mark.slow
def test_batched_chain_matches_single(chain_env):
    """edit_frames (one device program per stage for N pairs) must match
    edit_frame pair-by-pair: batching may not change any output."""
    from PIL import Image

    from sdn3d_tpu.cli.geometric_main import _keep_largest
    from sdn3d_tpu.data import vkitti as VK
    from sdn3d_tpu.pipelines.chain import ChainConfig, EditChain

    work, root, edit_json = chain_env
    cfg = ChainConfig(scales=(100,), image_size=64, render_size=64,
                      load_size=160, fine_width=160, fine_height=96)
    chain = EditChain.build(cfg, SHAPENET)
    items = VK.benchmark_split(VK.load_edit_json(edit_json))
    assert len(items) == 2
    table_inst = VK.get_tables("inst", root)

    requests = []
    for item in items:
        frame = int(item.source)
        image = np.asarray(Image.open(VK.rgb_path(
            root, item.world, item.topic, frame)).convert("RGB"))
        dets = _keep_largest(chain.infer_cfg, *VK.gt_objects(
            root, item.world, item.topic, frame, table_inst))
        requests.append({"image_rgb": image,
                         "operations": item.operations,
                         "dets": dets, "cache_key": item.source_name})

    batched = chain.edit_frames(requests)
    for r, b in zip(requests, batched):
        s = chain.edit_frame(r["image_rgb"], operations=r["operations"],
                             dets=r["dets"], cache_key=r["cache_key"])
        np.testing.assert_array_equal(b["label"], s["label"])
        np.testing.assert_array_equal(b["geo"]["instance_map"],
                                      s["geo"]["instance_map"])
        np.testing.assert_allclose(b["geo"]["normal_map"],
                                   s["geo"]["normal_map"], atol=1e-6)
        assert b["geo"]["json_obj"].keys() == s["geo"]["json_obj"].keys()
        np.testing.assert_allclose(b["fake"], s["fake"], atol=2e-5)


@pytest.mark.slow
def test_pipelined_chain_matches_batched(chain_env):
    """edit_frames_pipelined (3-deep software pipeline with async
    fetches) must match edit_frame pair-by-pair: overlap may not change
    any output — every device program is the same compiled program, only
    the host/device scheduling differs."""
    from PIL import Image

    from sdn3d_tpu.cli.geometric_main import _keep_largest
    from sdn3d_tpu.data import vkitti as VK
    from sdn3d_tpu.pipelines.chain import ChainConfig, EditChain

    work, root, edit_json = chain_env
    cfg = ChainConfig(scales=(100,), image_size=64, render_size=64,
                      load_size=160, fine_width=160, fine_height=96)
    chain = EditChain.build(cfg, SHAPENET)
    items = VK.benchmark_split(VK.load_edit_json(edit_json))
    table_inst = VK.get_tables("inst", root)

    requests = []
    for item in items:
        frame = int(item.source)
        image = np.asarray(Image.open(VK.rgb_path(
            root, item.world, item.topic, frame)).convert("RGB"))
        dets = _keep_largest(chain.infer_cfg, *VK.gt_objects(
            root, item.world, item.topic, frame, table_inst))
        requests.append({"image_rgb": image,
                         "operations": item.operations,
                         "dets": dets, "cache_key": item.source_name})

    # two single-request chunks: the pipeline actually staggers (A runs
    # two chunks ahead of the yield)
    pipe_chain = EditChain.build(cfg, SHAPENET)
    piped = [outs[0] for outs in
             pipe_chain.edit_frames_pipelined([[r] for r in requests])]
    assert len(piped) == len(requests)
    for r, p in zip(requests, piped):
        s = chain.edit_frame(r["image_rgb"], operations=r["operations"],
                             dets=r["dets"], cache_key=r["cache_key"])
        np.testing.assert_array_equal(p["label"], s["label"])
        np.testing.assert_array_equal(p["geo"]["instance_map"],
                                      s["geo"]["instance_map"])
        np.testing.assert_allclose(p["geo"]["normal_map"],
                                   s["geo"]["normal_map"], atol=1e-6)
        assert p["geo"]["json_obj"].keys() == s["geo"]["json_obj"].keys()
        # same tolerance as test_batched_chain_matches_single: the
        # batched render program only differs from the single-frame one
        # by the vmapped frame axis
        np.testing.assert_allclose(p["fake"], s["fake"], atol=2e-5)

    # pipelined == batched serial (identical programs): bit-exact
    batch_chain = EditChain.build(cfg, SHAPENET)
    serial = batch_chain.edit_frames(requests)
    pipe2_chain = EditChain.build(cfg, SHAPENET)
    piped2 = next(iter(pipe2_chain.edit_frames_pipelined([requests])))
    for a, b in zip(serial, piped2):
        np.testing.assert_array_equal(a["label"], b["label"])
        np.testing.assert_array_equal(a["geo"]["instance_map"],
                                      b["geo"]["instance_map"])
        np.testing.assert_array_equal(a["fake"], b["fake"])
        assert a["geo"]["json_obj"] == b["geo"]["json_obj"]


@pytest.mark.slow
def test_small_fetch_matches_full_fetch(chain_env):
    """The device-downsized serving contract (ChainConfig.small_fetch:
    instance/normal planes resized on device with ops/pil_resize and
    fetched at conditioning resolution) must be output-identical to the
    full-resolution fetch + host PIL path — in both single and batched
    chain modes."""
    from PIL import Image

    from sdn3d_tpu.cli.geometric_main import _keep_largest
    from sdn3d_tpu.data import vkitti as VK
    from sdn3d_tpu.pipelines.chain import ChainConfig, EditChain

    work, root, edit_json = chain_env
    # fine 160x48 == scale_width(load 160) of a 1242x375 frame, so the
    # transform plan is valid (the 160x96 shapes used elsewhere force
    # the host-path fallback because PIL would zero-pad)
    kw = dict(scales=(100,), image_size=64, render_size=64,
              load_size=160, fine_width=160, fine_height=48)
    chain_small = EditChain.build(ChainConfig(small_fetch=True, **kw),
                                  SHAPENET)
    chain_full = EditChain.build(ChainConfig(small_fetch=False, **kw),
                                 SHAPENET)
    items = VK.benchmark_split(VK.load_edit_json(edit_json))
    table_inst = VK.get_tables("inst", root)

    requests = []
    for item in items:
        frame = int(item.source)
        image = np.asarray(Image.open(VK.rgb_path(
            root, item.world, item.topic, frame)).convert("RGB"))
        dets = _keep_largest(chain_small.infer_cfg, *VK.gt_objects(
            root, item.world, item.topic, frame, table_inst))
        requests.append({"image_rgb": image,
                         "operations": item.operations,
                         "dets": dets, "cache_key": item.source_name})

    assert chain_small._small_plan(requests[0]["image_rgb"].shape) \
        is not None, "plan must be valid at these shapes"

    for r in requests:
        s = chain_small.edit_frame(r["image_rgb"],
                                   operations=r["operations"],
                                   dets=r["dets"],
                                   cache_key=r["cache_key"])
        f = chain_full.edit_frame(r["image_rgb"],
                                  operations=r["operations"],
                                  dets=r["dets"],
                                  cache_key=r["cache_key"])
        assert "instance_small" in s["geo"]
        assert "instance_png" in f["geo"]
        # the serving planes == PIL transform of the full-res planes
        np.testing.assert_array_equal(s["geo"]["instance_small"],
                                      np.asarray(Image.fromarray(
                                          f["geo"]["instance_png"]).resize(
                                          (160, 48), Image.NEAREST)))
        np.testing.assert_array_equal(s["geo"]["normal_small"],
                                      np.asarray(Image.fromarray(
                                          f["geo"]["normal_png"]).resize(
                                          (160, 48), Image.BICUBIC)))
        # identical final output, bit for bit
        np.testing.assert_array_equal(s["fake"], f["fake"])
        assert s["geo"]["json_obj"] == f["geo"]["json_obj"]

    # batched small path == single small path (and hence == full)
    batched = chain_small.edit_frames(requests)
    for r, b in zip(requests, batched):
        s = chain_small.edit_frame(r["image_rgb"],
                                   operations=r["operations"],
                                   dets=r["dets"],
                                   cache_key=r["cache_key"])
        np.testing.assert_array_equal(b["geo"]["instance_small"],
                                      s["geo"]["instance_small"])
        np.testing.assert_array_equal(b["fake"], s["fake"])


def test_detect_missing_batches_one_dispatch():
    """EditChain.detect_missing_begin must put every det-less frame of a
    chunk through ONE batched detection dispatch padded to the chunk
    size (r5; per-frame batch-1 dispatches made detection the maskrcnn
    serving mode's bottleneck), leave preset dets untouched, and be a
    no-op when nothing is missing."""
    import jax

    from sdn3d_tpu.models.maskrcnn import MaskRCNNConfig
    from sdn3d_tpu.pipelines.chain import ChainConfig, EditChain
    from sdn3d_tpu.pipelines.detect import MaskRCNNDetector

    cfg = MaskRCNNConfig(
        num_classes=3, image_min_dim=128, image_max_dim=128,
        rpn_anchor_scales=(8, 16, 32, 64, 128), pre_nms_limit=200,
        post_nms_rois_inference=50, detection_min_confidence=0.0,
        detection_max_instances=10, stage_sizes=(1, 1, 1, 1))
    det = MaskRCNNDetector(config=cfg)
    variables = det.init(jax.random.PRNGKey(0))

    calls = {"batch": 0, "sizes": []}
    orig = det.detect_begin_batch

    def counting(variables, images, pad_to=None):
        calls["batch"] += 1
        calls["sizes"].append((len(images), pad_to))
        return orig(variables, images, pad_to=pad_to)

    det.detect_begin_batch = counting

    chain = EditChain.__new__(EditChain)   # only the detector surface
    chain.detector = (det, variables)
    from sdn3d_tpu.models.derenderer import TargetType
    from sdn3d_tpu.pipelines.derender_infer import DerenderInferConfig
    chain.infer_cfg = DerenderInferConfig(image_size=64, render_size=64,
                                          mode=TargetType.extend)

    rng = np.random.RandomState(0)
    frames = [(rng.rand(96, 128, 3) * 255).astype(np.uint8)
              for _ in range(3)]
    preset = ("ids", "masks", "rois")
    requests = [{"image_rgb": frames[0], "dets": preset},
                {"image_rgb": frames[1]},
                {"image_rgb": frames[2]}]
    dets_list = [r.get("dets") for r in requests]
    handle = EditChain.detect_missing_begin(chain, requests, dets_list)
    EditChain.detect_missing_finish(chain, handle, dets_list)

    assert calls["batch"] == 1
    assert calls["sizes"] == [(2, 3)]      # 2 det-less, padded to chunk 3
    assert dets_list[0] is preset          # untouched
    for d in dets_list[1:]:
        assert isinstance(d, tuple) and len(d) == 3

    # nothing missing -> no dispatch at all
    handle = EditChain.detect_missing_begin(
        chain, requests, [preset, preset, preset])
    assert handle is None
