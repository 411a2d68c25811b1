"""Byte-exactness of the on-device PIL-convention resize
(ops/pil_resize.py) against Pillow itself — the guarantee that lets the
fused serving chain downsize instance/normal maps on device and fetch
192×624 planes instead of full-resolution frames without changing a
single output byte (reference resize venue:
textural/data/base_dataset.py:40-66)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from sdn3d_tpu.ops import pil_resize

SHAPES = [
    ((375, 1242), (624, 192)),     # the VKITTI serving geometry
    ((100, 300), (50, 20)),        # strong downscale
    ((64, 64), (128, 128)),        # upscale
    ((37, 111), (23, 9)),          # awkward ratios
    ((192, 624), (624, 192)),      # width no-op, height change
]


@pytest.mark.parametrize("shape,out_wh", SHAPES)
def test_bicubic_rgb_matches_pillow(shape, out_wh):
    h, w = shape
    ow, oh = out_wh
    img = np.random.RandomState(0).randint(0, 256, (h, w, 3), np.uint8)
    ref = np.asarray(Image.fromarray(img).resize((ow, oh), Image.BICUBIC))
    got = np.asarray(jax.jit(
        lambda x: pil_resize.resize_u8(x, ow, oh, "bicubic"))(
        jnp.asarray(img)))
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("shape,out_wh", SHAPES)
def test_nearest_l_matches_pillow(shape, out_wh):
    h, w = shape
    ow, oh = out_wh
    img = np.random.RandomState(1).randint(0, 256, (h, w), np.uint8)
    ref = np.asarray(Image.fromarray(img).resize((ow, oh), Image.NEAREST))
    got = np.asarray(jax.jit(
        lambda x: pil_resize.resize_nearest_u8(x, ow, oh))(
        jnp.asarray(img)))
    np.testing.assert_array_equal(got, ref)


def test_bilinear_matches_pillow():
    img = np.random.RandomState(2).randint(0, 256, (375, 1242, 3), np.uint8)
    ref = np.asarray(
        Image.fromarray(img).resize((624, 192), Image.BILINEAR))
    got = np.asarray(pil_resize.resize_u8(jnp.asarray(img), 624, 192,
                                          "bilinear"))
    np.testing.assert_array_equal(got, ref)


def test_transform_plan_matches_transform_image():
    """Device apply_plan_u8 == host transform_image (scale_width + the
    188→192 hack + center crop) for both filters, byte-for-byte."""
    from sdn3d_tpu.data.textural_data import transform_image

    rng = np.random.RandomState(3)
    for (h, w), load, fine in [((375, 1242), 624, (624, 192)),
                               ((200, 700), 624, (624, 160)),
                               ((192, 624), 624, (624, 192))]:
        plan = pil_resize.transform_plan((w, h), load, fine)
        assert plan is not None, (h, w)
        assert (plan.out_w, plan.out_h) == fine

        rgb = rng.randint(0, 256, (h, w, 3), np.uint8)
        host = (np.asarray(transform_image(
            Image.fromarray(rgb), load, fine, normalize=False))
            * 255.0).astype(np.uint8)
        dev = np.asarray(pil_resize.apply_plan_u8(jnp.asarray(rgb), plan))
        np.testing.assert_array_equal(dev, host)

        lbl = rng.randint(0, 17, (h, w), np.uint8)
        host_l = (np.asarray(transform_image(
            Image.fromarray(lbl), load, fine, nearest=True,
            normalize=False))[..., 0] * 255.0).astype(np.uint8)
        dev_l = np.asarray(pil_resize.apply_plan_u8(
            jnp.asarray(lbl), plan, nearest=True))
        np.testing.assert_array_equal(dev_l, host_l)


def test_transform_plan_rejects_padding_cases():
    # a source narrower than the crop would make PIL zero-pad; the plan
    # must refuse so callers fall back to the host path
    assert pil_resize.transform_plan((624, 100), 624, (624, 192)) is None
