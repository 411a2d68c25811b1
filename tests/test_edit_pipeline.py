"""Edit-engine tests: op matching, modify/delete semantics, compositing
(reference: geometric/scripts/main.py:461-622)."""

import numpy as np
import pytest

pytestmark = pytest.mark.quick

import jax
import jax.numpy as jnp

from sdn3d_tpu.data.vkitti import Camera, crop_square, roi_norms_from_rois, \
    load_edit_json, benchmark_split, get_lists
from sdn3d_tpu.pipelines.edit import (
    match_operations, apply_operations, composite_objects, compute_interests)


def test_match_operations_nearest():
    mroi = np.asarray([[0.0, 0.0], [0.1, 0.5]], np.float32)
    ops = [
        {"type": "modify",
         "from": {"u": Camera.u0 + 0.5 * Camera.focal,
                  "v": Camera.v0 + 0.1 * Camera.focal}},
        {"type": "delete",
         "from": {"u": Camera.u0, "v": Camera.v0}},
    ]
    pairs = match_operations(mroi, ops)
    assert sorted(pairs) == [(0, 1), (1, 0)]


def test_apply_operations_modify_and_delete():
    B = 2
    blob = {
        "_theta_deltas": jnp.asarray([[1.0, 0.0], [0.0, 1.0]]),
        "_translation2ds": jnp.zeros((B, 2)),
        "_log_depths": jnp.zeros((B, 1)),
        "_mroi_norms": jnp.zeros((B, 2)),
        "_droi_norms": jnp.ones((B, 2)),
    }
    ops = [
        {"type": "modify", "from": {"u": "620.5", "v": "187.0"},
         "to": {"u": str(Camera.u0 + Camera.focal)},
         "zoom": "2.0", "ry": str(np.pi / 2)},
        {"type": "delete", "from": {"u": "620.5", "v": "187.0"}},
    ]
    interests = np.ones(B, np.uint8)
    out, interests = apply_operations(blob, interests, ops, [(0, 0), (1, 1)])
    assert interests[1] == 0 and interests[0] == 1
    # log depth -= 2 log 2
    np.testing.assert_allclose(float(out["_log_depths"][0, 0]),
                               -2 * np.log(2.0), rtol=1e-5)
    # theta rotated by -pi/2: (cos, sin) = (1, 0) -> (0, -1)
    np.testing.assert_allclose(np.asarray(out["_theta_deltas"][0]),
                               [0.0, -1.0], atol=1e-6)
    # translation2d: target u moved 1 unit in normalized coords
    np.testing.assert_allclose(np.asarray(out["_translation2ds"][0]),
                               [0.0, 1.0], atol=1e-5)


def test_composite_objects_occlusion():
    """Nearer object must overwrite farther one; deleted objects vanish."""
    N, R = 3, 32
    masks = np.zeros((N, 1, R, R), np.float32)
    masks[:, :, 8:24, 8:24] = 1.0
    normals = np.zeros((N, 3, R, R), np.float32)
    normals[0] += 0.5
    normals[1] -= 0.5
    depth_maps = np.ones((N, 1, R, R), np.float32) * 5.0

    center = np.zeros((N, 2), np.float32)            # all at principal point
    zooms = np.full((N, 1), 4.0, np.float32)         # paste size 384/4 = 96
    depths = np.asarray([[10.0], [5.0], [7.0]], np.float32)
    interests = np.asarray([1, 1, 0], np.uint8)      # object 2 deleted

    inst, nrm, dep = composite_objects(
        jnp.asarray(masks), jnp.asarray(normals), jnp.asarray(depth_maps),
        jnp.asarray(center), jnp.asarray(zooms), jnp.asarray(depths),
        jnp.asarray(interests), height=128, width=256, render_size=384,
        focal=100.0, u0=128.0, v0=64.0)
    inst = np.asarray(inst)
    # nearest interested object is index 1 -> instance id 2 at the center
    assert inst[64, 128] == 2
    # object 2 (deleted) must appear nowhere
    assert not (inst == 3).any()
    # background
    assert inst[0, 0] == 0
    assert np.asarray(dep)[0, 0] == 1.0
    np.testing.assert_allclose(np.asarray(nrm)[:, 0, 0], 0.5)


def test_compute_interests():
    cls = np.asarray([1, 2, 3, 1])
    areas = np.asarray([1000, 100, 5000, 5000])
    np.testing.assert_array_equal(compute_interests(cls, areas), [1, 0, 0, 1])
    np.testing.assert_array_equal(compute_interests(cls, areas, True),
                                  [1, 1, 1, 1])


def test_crop_square_roi_norms():
    img = np.arange(24, dtype=np.float32).reshape(4, 6, 1)
    out = crop_square(img, (1, 1, 3, 5), fill=-1.0)
    assert out.shape == (4, 4, 1)
    rois = np.asarray([[187.0, 620.5, 187.0 + 725.0, 620.5 + 725.0]])
    n = roi_norms_from_rois(rois)
    np.testing.assert_allclose(n, [[0, 0, 1, 1]], atol=1e-6)


def test_benchmark_json_protocol():
    items = load_edit_json("/root/reference/assets/vkitti_edit_benchmark.json")
    assert len(items) == 184
    edits = benchmark_split(items)
    assert len(edits) == 92
    n_ops = sum(len(i.operations) for i in edits)
    kinds = [op["type"] for i in edits for op in i.operations]
    assert kinds.count("modify") == 393 and kinds.count("delete") == 31
    assert all(i.source == i.target for i in items[92:])


def test_get_lists_split_sizes():
    train, test = get_lists("train"), get_lists("test")
    assert len(train) + len(test) == len(get_lists("all"))
    assert len(set(train) & set(test)) == 0


def test_edit_2d_ablations():
    from sdn3d_tpu.pipelines.ablations import edit_2d, edit_2d_plus
    H, W = 64, 96
    masks = np.zeros((2, 1, H, W), np.float32)
    masks[0, 0, 10:30, 10:30] = 1
    masks[1, 0, 30:50, 50:80] = 1
    rois = np.asarray([[10, 10, 30, 30], [30, 50, 50, 80]], np.float32)
    cls = np.asarray([1, 2])
    ops = [{"type": "modify", "from": {"u": "20", "v": "20"},
            "to": {"u": "40", "v": "20"}, "zoom": "1.0", "ry": "0.0"},
           {"type": "delete", "from": {"u": "65", "v": "40"}}]
    out = edit_2d((H, W), cls, masks, rois, ops)
    # object 0 moved right by 20px, object 1 deleted
    assert out["instance_map"][20, 40] == 1
    assert not (out["instance_map"] == 2).any()
    assert 2 not in out["json_obj"]

    out2 = edit_2d_plus((H, W), cls, masks, rois,
                        [{"type": "modify", "from": {"u": "20", "v": "20"},
                          "to": {}, "zoom": "1.0",
                          "ry": str(np.pi / 3)}])
    # 2D+ foreshortens width by cos(ry) = 0.5
    w1 = (out["instance_map"] == 1)[20].sum()
    w2 = (out2["instance_map"] == 1)[20].sum()
    assert w2 < w1


def test_interactive_editor():
    from sdn3d_tpu.pipelines.interactive import (
        EditState, add_object, change_label, remove_object, transfer_style,
        to_batch)
    H, W = 16, 24
    st = EditState(label=np.full((H, W), 5, np.int32),
                   inst=np.full((H, W), 5, np.int32),
                   feat_codes={})
    mask = np.zeros((H, W), bool)
    mask[4:10, 4:10] = True
    st = add_object(st, mask, 2000, 2, np.arange(5, dtype=np.float32))
    assert (st.inst[5, 5] == 2000) and (st.label[5, 5] == 2)
    st = transfer_style(st, 2000, np.ones(5))
    np.testing.assert_allclose(st.feat_codes[2000], 1.0)
    region = np.zeros((H, W), bool)
    region[:2] = True
    st = change_label(st, region, 6)
    assert (st.label[0] == 6).all()
    batch = to_batch(st)
    assert batch["feat_map"].shape == (1, H, W, 5)
    np.testing.assert_allclose(batch["feat_map"][0, 5, 5], 1.0)
    st = remove_object(st, 2000)
    assert not (st.inst == 2000).any()


def test_ui_model_click_surface():
    """ui_model.py click/brush/undo/style ops (load_state, EditSession,
    change_labels_click, add_strokes, add_objects_click, style_forward)."""
    from sdn3d_tpu.pipelines.interactive import (
        EditSession, add_objects_click, add_strokes, change_labels_click,
        get_crop_region, load_state, stroke_region, style_forward, to_batch)

    H, W = 32, 48
    label = np.full((H, W), 5, np.int32)
    inst = np.full((H, W), 5, np.int32)
    label[8:16, 8:20] = 2
    inst[8:16, 8:20] = 2001          # a car instance
    clusters = {2: np.arange(15, dtype=np.float32).reshape(3, 5),
                5: np.zeros((2, 5), np.float32),
                6: np.full((2, 5), 7.0, np.float32)}
    st = load_state(label, inst, clusters)
    # seeded cluster pick: same seed -> same row every load (ui_model:82-84)
    st2 = load_state(label, inst, clusters)
    np.testing.assert_allclose(st.feat_codes[2001], st2.feat_codes[2001])
    assert 5 in st.feat_codes

    sess = EditSession(st)
    # click-driven label swap: the car takes the road's label; a road
    # (non-instanced) target keeps its plain id
    sess.apply(change_labels_click, (10, 10), (30, 40))
    assert (sess.state.label[8:16, 8:20] == 5).all()
    assert not (sess.state.inst == 2001).any()
    sess.undo()
    assert (sess.state.inst[10, 10] == 2001)

    # instanced target allocates a fresh id in the class band (:138-142)
    label2 = label.copy(); inst2 = inst.copy()
    label2[20:24, 30:40] = 2; inst2[20:24, 30:40] = 2002
    st3 = load_state(label2, inst2, clusters)
    out = change_labels_click(st3, (30, 3), (10, 10))   # road -> car class
    new_id = int(out.inst[30, 3])
    assert new_id > 2002 and out.label[30, 3] == 2
    # the moved region keeps its own (road) texture code
    np.testing.assert_allclose(out.feat_codes[new_id], st3.feat_codes[5])

    # square brush, edge-clamped
    r = stroke_region((H, W), (0, 0), 4)
    assert r[:4, :4].all() and r.sum() == 16
    out = add_strokes(st3, (5, 5), 6, 4, clusters, cluster_idx=1)
    assert (out.label[3:7, 3:7] == 6).all()
    np.testing.assert_allclose(out.feat_codes[6], 7.0)

    # click-anchored paste
    tpl = np.ones((6, 6), bool)
    out = add_objects_click(st3, (2, 2), 6, tpl, clusters, style_id=0)
    assert (out.inst[2:8, 2:8] == 6).all()

    # crop region is padded to crop_min
    crop = get_crop_region(inst == 2001, crop_min=16)
    min_y, min_x, max_y, max_x = crop
    assert max_y - min_y >= 8 and max_x - min_x >= 12
    assert min_y <= 8 and max_x >= 19
    # unpadded: exclusive slice bounds that cover the WHOLE instance
    # (mask rows 8..15, cols 8..19)
    assert get_crop_region(inst == 2001, crop_min=4) == (8, 8, 16, 20)

    # target instance id exactly 1000 (object index 1) is instanced: the
    # moved region gets a FRESH id in label-band 1, not merged into 1000
    label3 = np.full((H, W), 5, np.int32)
    inst3 = np.full((H, W), 5, np.int32)
    label3[0:4, 0:4] = 1; inst3[0:4, 0:4] = 1000
    st4 = load_state(label3, inst3, {5: clusters[5], 1: clusters[5]})
    out = change_labels_click(st4, (20, 20), (1, 1))
    moved_id = int(out.inst[20, 20])
    assert moved_id != 1000 and 1000 < moved_id < 2000
    assert (out.inst[0:4, 0:4] == 1000).all()   # the old instance remains

    # style previews: 3 clusters -> 3 cropped previews from the generate fn
    calls = []
    def generate(s):
        calls.append(s.feat_codes[2001].copy())
        return np.zeros((H, W, 3))
    previews, _, crop = style_forward(st3, (10, 10), clusters, generate,
                                      style_id=-1, crop_min=16)
    assert len(previews) == 3
    assert previews[0].shape[0] == crop[2] - crop[0]
    assert not np.allclose(calls[0], calls[1])
    # committing a style
    _, committed, _ = style_forward(st3, (10, 10), clusters, generate,
                                    style_id=2, crop_min=16)
    np.testing.assert_allclose(committed.feat_codes[2001], clusters[2][2])
    assert to_batch(committed)["feat_map"].shape == (1, H, W, 5)


def test_locks(tmp_path):
    from sdn3d_tpu.utils.locks import try_claim, crash_guard
    d = str(tmp_path)
    assert try_claim(d, "00001")
    assert not try_claim(d, "00001")
    with crash_guard("00001"):
        raise RuntimeError("boom")   # swallowed, frame skipped


def test_composite_matmul_matches_loop():
    """The MXU (separable-matmul + rank-argmax) composite must reproduce
    the sequential gather-paste loop: instance maps EXACTLY, float maps
    to fp-associativity (the einsum accumulates the same two products
    per axis)."""
    from sdn3d_tpu.pipelines.edit import composite_objects

    rng = np.random.RandomState(0)
    N, R, H, W = 5, 32, 48, 96
    masks = np.zeros((N, 1, R, R), np.float32)
    for k in range(N):
        a, b = rng.randint(2, 12), rng.randint(2, 12)
        masks[k, 0, a:a + 14, b:b + 14] = 1.0
    normals = rng.rand(N, 3, R, R).astype(np.float32) * 2 - 1
    depth_maps = rng.rand(N, 1, R, R).astype(np.float32) * 50
    center2ds = (rng.rand(N, 2).astype(np.float32) - 0.5) * 0.1
    zooms = (rng.rand(N, 1).astype(np.float32) * 3 + 1)
    depths = rng.rand(N, 1).astype(np.float32) * 30 + 5
    interests = np.asarray([1, 1, 0, 1, 1], np.uint8)

    args = (jnp.asarray(masks), jnp.asarray(normals),
            jnp.asarray(depth_maps), jnp.asarray(center2ds),
            jnp.asarray(zooms), jnp.asarray(depths),
            jnp.asarray(interests))
    kw = dict(height=H, width=W, render_size=R, focal=60.0,
              u0=W / 2.0, v0=H / 2.0)
    i_mm, n_mm, d_mm = composite_objects(*args, method="matmul", **kw)
    i_lp, n_lp, d_lp = composite_objects(*args, method="loop", **kw)

    np.testing.assert_array_equal(np.asarray(i_mm), np.asarray(i_lp))
    assert np.asarray(i_mm).max() >= 1      # something actually pasted
    np.testing.assert_allclose(np.asarray(n_mm), np.asarray(n_lp),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(d_mm), np.asarray(d_lp),
                               atol=1e-6)


@pytest.mark.slow
def test_composite_matmul_matches_loop_serving_shape():
    """matmul==loop instance-map parity at the SERVING shape (16 objects,
    375x1242, render_size 384) with adversarial masks: anti-aliased soft
    edges plus values seeded exactly at 0.5 +/- 1 ulp, the boundary where
    the two paths' post-interpolation binarization could in principle
    round apart.  Exact-parity dumps should use method='loop' if this
    ever diverges on a new backend (see composite_objects docstring)."""
    from sdn3d_tpu.data.vkitti import Camera
    from sdn3d_tpu.pipelines.edit import composite_objects

    rng = np.random.RandomState(7)
    N, R = 16, 384
    H, W = Camera.height, Camera.width
    masks = np.zeros((N, 1, R, R), np.float32)
    half = np.float32(0.5)
    for k in range(N):
        a, b = rng.randint(4, R // 2, 2)
        h, w = rng.randint(40, 160, 2)
        masks[k, 0, a:a + h, b:b + w] = 1.0
        # soft 2px border (fractional interpolation inputs)
        masks[k, 0, a:a + h, b] = 0.5
        masks[k, 0, a, b:b + w] = np.nextafter(half, np.float32(0.0))
        masks[k, 0, min(a + h, R - 1), b:b + w] = np.nextafter(
            half, np.float32(1.0))
    normals = rng.rand(N, 3, R, R).astype(np.float32) * 2 - 1
    depth_maps = rng.rand(N, 1, R, R).astype(np.float32) * 50
    center2ds = (rng.rand(N, 2).astype(np.float32) - 0.5) * 0.2
    zooms = (rng.rand(N, 1).astype(np.float32) * 3 + 1)
    depths = rng.rand(N, 1).astype(np.float32) * 30 + 5
    interests = np.ones((N,), np.uint8)

    args = (jnp.asarray(masks), jnp.asarray(normals),
            jnp.asarray(depth_maps), jnp.asarray(center2ds),
            jnp.asarray(zooms), jnp.asarray(depths),
            jnp.asarray(interests))
    i_mm, _, _ = composite_objects(*args, method="matmul", height=H,
                                   width=W, render_size=R)
    i_lp, _, _ = composite_objects(*args, method="loop", height=H,
                                   width=W, render_size=R)
    np.testing.assert_array_equal(np.asarray(i_mm), np.asarray(i_lp))
    assert np.asarray(i_mm).max() >= 1
