"""End-to-end geometric inference pipeline test (main.py:_test parity
structure) on synthetic meshes and random weights."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sdn3d_tpu.data.synthetic import make_sphere_mesh
from sdn3d_tpu.geometry.assets import build_mesh_bank
from sdn3d_tpu.models.derenderer import Derenderer, DeviceMeshBank
from sdn3d_tpu.pipelines.derender_infer import (
    DerenderInferConfig, derender_image)


@pytest.fixture(scope="module")
def setup():
    verts, faces = make_sphere_mesh(4, 8)
    bank = DeviceMeshBank.from_host(build_mesh_bank([(verts, faces)] * 2))
    model = Derenderer(num_classes=2)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 2)),
        jnp.zeros((1, 2)), train=False)
    cfg = DerenderInferConfig(image_size=64, render_size=64, max_objects=4)
    return model, variables, bank, cfg


def fake_scene(h=96, w=160, n=2):
    rng = np.random.RandomState(0)
    image = (rng.rand(h, w, 3) * 255).astype(np.uint8)
    rois = np.asarray([[20, 30, 60, 80], [40, 90, 85, 150]], np.float32)[:n]
    masks = np.zeros((n, 1, h, w), np.float32)
    for i, r in enumerate(rois):
        masks[i, 0, int(r[0]) + 5:int(r[2]) - 5, int(r[1]) + 5:int(r[3]) - 5] = 1
    class_ids = np.asarray([1, 2][:n])
    return image, rois, masks, class_ids


def test_derender_image_smoke(setup):
    model, variables, bank, cfg = setup
    image, rois, masks, class_ids = fake_scene()
    out = derender_image(variables, model, bank, image, class_ids, masks,
                         rois, cfg)
    assert out["instance_map"].shape == image.shape[:2]
    assert out["normal_map"].shape == (3,) + image.shape[:2]
    assert out["depth_map"].shape == image.shape[:2]
    assert set(np.unique(out["instance_map"])).issubset({0, 1, 2})
    assert set(out["json_obj"].keys()).issubset({1, 2})
    for entry in out["json_obj"].values():
        assert np.isfinite(entry["depth"]) and np.isfinite(entry["alpha"])
    assert out["depth_map"].min() >= 0 and out["depth_map"].max() <= 1


def test_derender_image_delete_op(setup):
    model, variables, bank, cfg = setup
    image, rois, masks, class_ids = fake_scene()
    from sdn3d_tpu.data.vkitti import Camera
    # center of object 0 in pixels
    cy = (rois[0, 0] + rois[0, 2]) / 2
    cx = (rois[0, 1] + rois[0, 3]) / 2
    ops = [{"type": "delete", "from": {"u": str(cx), "v": str(cy)}},
           {"type": "modify",
            "from": {"u": str((rois[1, 1] + rois[1, 3]) / 2),
                     "v": str((rois[1, 0] + rois[1, 2]) / 2)},
            "to": {}, "zoom": "1.5", "ry": "0.3"}]
    out = derender_image(variables, model, bank, image, class_ids, masks,
                         rois, cfg, operations=ops)
    assert 1 not in out["json_obj"]          # deleted object dropped
    assert not (out["instance_map"] == 1).any()


def test_derender_image_refinement_runs(setup):
    model, variables, bank, cfg = setup
    import dataclasses
    cfg2 = dataclasses.replace(cfg, num_opts=2)
    image, rois, masks, class_ids = fake_scene()
    out = derender_image(variables, model, bank, image, class_ids, masks,
                         rois, cfg2)
    assert np.isfinite(out["depth_map"]).all()


def test_derender_images_batch_matches_single(setup):
    """The batched multi-frame path (one [N*M]-object render + vmapped
    composites) must produce the SAME outputs as per-frame
    derender_image — the file contract may not change with batching."""
    from sdn3d_tpu.pipelines.derender_infer import derender_images_batch

    model, variables, bank, cfg = setup
    image, rois, masks, class_ids = fake_scene()
    ops = [{"type": "modify",
            "from": {"u": str((rois[1, 1] + rois[1, 3]) / 2),
                     "v": str((rois[1, 0] + rois[1, 2]) / 2)},
            "to": {}, "zoom": "1.2", "ry": "0.2"}]
    # three frames: plain, edited, single-object
    frames = [
        {"image_rgb": image, "class_ids": class_ids, "image_masks": masks,
         "rois": rois},
        {"image_rgb": image, "class_ids": class_ids, "image_masks": masks,
         "rois": rois, "operations": ops},
        {"image_rgb": image, "class_ids": class_ids[:1],
         "image_masks": masks[:1], "rois": rois[:1]},
    ]
    batched = derender_images_batch(variables, model, bank, frames, cfg)
    assert len(batched) == 3
    for fr, b in zip(frames, batched):
        single = derender_image(variables, model, bank, fr["image_rgb"],
                                fr["class_ids"], fr["image_masks"],
                                fr["rois"], cfg,
                                operations=fr.get("operations"))
        np.testing.assert_array_equal(b["instance_map"],
                                      single["instance_map"])
        np.testing.assert_allclose(b["normal_map"], single["normal_map"],
                                   atol=1e-6)
        np.testing.assert_allclose(b["depth_map"], single["depth_map"],
                                   atol=1e-6)
        assert b["json_obj"].keys() == single["json_obj"].keys()
        for k in b["json_obj"]:
            for f in ("class_id", "depth", "alpha"):
                np.testing.assert_allclose(b["json_obj"][k][f],
                                           single["json_obj"][k][f],
                                           rtol=1e-6)
        np.testing.assert_array_equal(b["interests"], single["interests"])


def test_derender_images_batch_sharded(setup):
    """The frame axis is the data-parallel serving axis: the batched
    render sharded over the 8-device mesh must equal the unsharded run
    (each device renders + composites its own frames; no collectives in
    the inference graph)."""
    from sdn3d_tpu.parallel import batch_sharding, make_mesh
    from sdn3d_tpu.pipelines.derender_infer import derender_images_batch

    model, variables, bank, cfg = setup
    image, rois, masks, class_ids = fake_scene()
    frame = {"image_rgb": image, "class_ids": class_ids,
             "image_masks": masks, "rois": rois}
    frames = [frame] * 8
    mesh = make_mesh(8)
    plain = derender_images_batch(variables, model, bank, frames, cfg)
    sharded = derender_images_batch(variables, model, bank, frames, cfg,
                                    sharding=batch_sharding(mesh))
    for p, s in zip(plain, sharded):
        np.testing.assert_array_equal(p["instance_map"],
                                      s["instance_map"])
        np.testing.assert_allclose(p["normal_map"], s["normal_map"],
                                   atol=1e-6)
        np.testing.assert_allclose(p["depth_map"], s["depth_map"],
                                   atol=1e-6)


def test_prepare_objects_hoisted_conversion_is_byte_exact(setup):
    """prepare_objects hoists the full-frame uint8->[0,1] conversion out
    of its per-object loop; the slots must stay byte-identical to
    per-object transform_rgb_u8/transform_mask on the raw inputs."""
    from sdn3d_tpu.data import vkitti as VK
    from sdn3d_tpu.pipelines.derender_infer import prepare_objects

    _model, _variables, _bank, cfg = setup
    image, rois, masks, class_ids = fake_scene()
    objs = prepare_objects(image, rois, masks, class_ids, cfg)
    assert objs["rgbs"].dtype == np.uint8
    for i in range(len(rois)):
        ref_rgb = VK.transform_rgb_u8(image, rois[i], cfg.image_size)
        ref_mask = VK.transform_mask(masks[i, 0], rois[i], cfg.render_size)
        assert np.array_equal(objs["rgbs"][i], ref_rgb)
        assert np.array_equal(objs["masks"][i, 0], ref_mask)
    # uint8 masks route through the same astype
    objs_u8 = prepare_objects(image, rois, masks.astype(np.uint8),
                              class_ids, cfg)
    assert np.array_equal(objs_u8["masks"], objs["masks"])


def test_encode_uint8_upload_matches_host_normalization(setup):
    """encode_objects ships uint8 crops and dequantizes + normalizes on
    device.  The device math ((x/255 - 0.5)/0.25 in f32) must equal the
    host normalization of the same quantized crop bit-for-bit — the
    uint8 upload changes WHERE the normalization runs, never its value
    (quantization itself is the reference's own: its crops come out of a
    uint8 PIL resize, derender3d/datasets.py:157-173)."""
    from sdn3d_tpu.pipelines.derender_infer import (_encode_jit,
                                                    encode_objects,
                                                    prepare_objects)

    _m, _v, _bank, cfg = setup
    for dtype in (jnp.float32, jnp.bfloat16):
        model = Derenderer(num_classes=2, dtype=dtype)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
            jnp.zeros((1, 2)), jnp.zeros((1, 2)), train=False)
        image, rois, masks, class_ids = fake_scene()
        objs = prepare_objects(image, rois, masks, class_ids, cfg)
        assert objs["rgbs"].dtype == np.uint8

        blob_u8, packed_u8 = encode_objects(variables, model, objs, cfg)
        # host-side normalization of the SAME quantized crop (f32 ops in
        # the device order), shipped the legacy way
        host = ((objs["rgbs"].astype(np.float32) / np.float32(255.0)
                 - np.float32(0.5)) / np.float32(0.25))
        host_objs = dict(objs, rgbs=host)
        blob_f32, packed_f32 = encode_objects(variables, model, host_objs,
                                              cfg)
        np.testing.assert_array_equal(np.asarray(packed_u8),
                                      np.asarray(packed_f32))
        for k in blob_f32:
            np.testing.assert_array_equal(np.asarray(blob_u8[k]),
                                          np.asarray(blob_f32[k]),
                                          err_msg=f"{dtype} {k}")


def test_encode_sliced_upload_matches_full(setup):
    """encode_objects uploads only the n real crops and zero-pads to the
    slot count on device; the encoder must receive the exact [M]-slot
    tensor the full upload produced (same program -> same packed bytes).
    n == 0 (no detections) routes through device zeros."""
    from sdn3d_tpu.pipelines.derender_infer import (_encode_jit,
                                                    encode_objects,
                                                    prepare_objects)

    model, variables, bank, cfg = setup
    image, rois, masks, class_ids = fake_scene()
    objs = prepare_objects(image, rois, masks, class_ids, cfg)
    assert objs["num_objs"] < cfg.max_objects       # slicing engages
    blob_sliced, packed_sliced = encode_objects(variables, model, objs,
                                                cfg)
    # legacy full-[M] upload (bypass the slice by lying about num_objs)
    full = dict(objs, num_objs=cfg.max_objects)
    blob_full, packed_full = encode_objects(variables, model, full, cfg)
    np.testing.assert_array_equal(np.asarray(packed_sliced),
                                  np.asarray(packed_full))

    empty = prepare_objects(image, np.zeros((0, 4), np.float32),
                            np.zeros((0, 1) + image.shape[:2], np.float32),
                            np.zeros((0,), np.int32), cfg)
    blob0, packed0 = encode_objects(variables, model, empty, cfg)
    for k, v in blob0.items():
        assert np.isfinite(np.asarray(v, np.float32)).all(), k


def test_encode_batch_matches_per_frame(setup):
    """derender_encode_batch (one [N*M]-slot encoder dispatch + one
    packed fetch for the whole chunk) must return exactly what
    derender_encode returns per frame — the chunk batching only
    concatenates independent object slots."""
    from sdn3d_tpu.pipelines.derender_infer import (derender_encode,
                                                    derender_encode_batch)

    model, variables, bank, cfg = setup
    image, rois, masks, class_ids = fake_scene()
    frames = [
        {"image_rgb": image, "class_ids": class_ids, "image_masks": masks,
         "rois": rois},
        {"image_rgb": image[::-1].copy(), "class_ids": class_ids[:1],
         "image_masks": masks[:1], "rois": rois[:1]},
    ]
    batched = derender_encode_batch(variables, model, frames, cfg)
    assert len(batched) == 2
    for fr, (objs_b, blob_b) in zip(frames, batched):
        objs_s, blob_s = derender_encode(
            variables, model, bank, fr["image_rgb"], fr["class_ids"],
            fr["image_masks"], fr["rois"], cfg)
        for k in objs_s:
            np.testing.assert_array_equal(np.asarray(objs_b[k]),
                                          np.asarray(objs_s[k]),
                                          err_msg=k)
        assert blob_b.keys() == blob_s.keys()
        for k in blob_s:
            np.testing.assert_array_equal(np.asarray(blob_b[k]),
                                          np.asarray(blob_s[k]),
                                          err_msg=k)
