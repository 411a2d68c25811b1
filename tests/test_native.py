"""Native host-library tests: build + parity with the numpy fallbacks and
with the device NMS."""

import numpy as np
import pytest

pytestmark = pytest.mark.quick

from sdn3d_tpu.data import native


@pytest.fixture(scope="module", autouse=True)
def built():
    assert native.available(), "native lib should build with g++"


def test_scenegt_decode_parity():
    rng = np.random.RandomState(0)
    keys = np.unique(rng.randint(0, 1 << 24, 50).astype(np.uint32))
    vals = rng.randint(0, 14, len(keys)).astype(np.int32)
    img = np.zeros((8, 12, 3), np.uint8)
    codes = rng.choice(keys, size=(8, 12))
    img[..., 0] = (codes >> 16) & 0xFF
    img[..., 1] = (codes >> 8) & 0xFF
    img[..., 2] = codes & 0xFF
    img[0, 0] = 255  # probably-missing code

    out = native.scenegt_decode(img, keys, vals)
    lut = {int(k): int(v) for k, v in zip(keys, vals)}
    for y in range(8):
        for x in range(12):
            code = (int(img[y, x, 0]) << 16) | (int(img[y, x, 1]) << 8) \
                | int(img[y, x, 2])
            assert out[y, x] == lut.get(code, -1)


def test_crop_square_resize_matches_numpy():
    rng = np.random.RandomState(1)
    img = rng.rand(40, 60, 3).astype(np.float32)
    roi = (5, 10, 25, 50)
    got = native.crop_square_resize(img, roi, 16)

    from sdn3d_tpu.data.vkitti import crop_square, resize_bilinear_np
    crop = crop_square(img, roi, fill=0.5)
    want = resize_bilinear_np(crop, 16)
    want = (want - 0.5) / 0.25
    # The native resampler replicates PIL's convolution resampling exactly.
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_nms_cpu_matches_device_nms():
    import jax.numpy as jnp
    from sdn3d_tpu.ops.nms import nms

    rng = np.random.RandomState(2)
    lo = rng.uniform(0, 80, (48, 2))
    hi = lo + rng.uniform(1, 40, (48, 2))
    boxes = np.concatenate([lo, hi], 1).astype(np.float32)
    for thr in (0.3, 0.5):
        keep_native = native.nms_cpu(boxes, thr)
        keep_device = np.asarray(nms(jnp.asarray(boxes), thr))
        np.testing.assert_array_equal(keep_native, keep_device)


def test_crop_square_resize_roi_outside_image():
    """A ROI fully outside the image must yield pure fill (the C path
    previously took memcpy with a negative, size_t-wrapped length)."""
    from sdn3d_tpu.data import native

    img = np.random.RandomState(0).rand(40, 60, 3).astype(np.float32)
    for roi in [(10, -50, 20, -40), (-30, 10, -20, 20), (50, 70, 60, 90)]:
        out = native.crop_square_resize(img, np.asarray(roi, np.int32), 16,
                                        fill=0.5)
        # (0.5 - mean) / std with defaults = exactly 0 everywhere
        np.testing.assert_allclose(out, 0.0, atol=1e-6)


def test_decode_scenegt_no_table_entries():
    """A (world, scene) with no LUT rows returns an all -1 id map
    instead of raising on the empty searchsorted."""
    from sdn3d_tpu.data.vkitti import decode_scenegt

    img = np.zeros((4, 5, 3), np.uint8)
    out = decode_scenegt(img, "0001", "clone", table={})
    assert out.shape == (4, 5) and (out == -1).all()
