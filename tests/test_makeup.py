"""Makeup recolor utilities (`face_parsing/makeup.py` rebuild)."""

import numpy as np

from adaface_tpu.utils.makeup import (MAKEUP_PARTS, apply_makeup, hsv_to_rgb,
                                      recolor_part, rgb_to_hsv, sharpen)


def test_hsv_roundtrip():
    rng = np.random.RandomState(0)
    img = rng.rand(16, 16, 3)
    back = hsv_to_rgb(rgb_to_hsv(img))
    np.testing.assert_allclose(back, img, atol=1e-9)


def test_recolor_only_touches_part():
    rng = np.random.RandomState(1)
    image = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
    parsing = np.zeros((32, 32), np.int32)
    parsing[8:16, 8:16] = 17  # hair patch
    out = recolor_part(image, parsing, 17, (10, 250, 10))
    assert np.array_equal(out[parsing != 17], image[parsing != 17])
    assert not np.array_equal(out[parsing == 17], image[parsing == 17])


def test_lip_mode_replaces_hue_and_saturation():
    image = np.full((8, 8, 3), 0, np.uint8)
    image[..., 0] = 200  # saturated red-ish region
    image[..., 1] = 50
    parsing = np.full((8, 8), 12, np.int32)
    target = (20, 60, 230)
    out = recolor_part(image, parsing, 12, target)
    got_hsv = rgb_to_hsv(out.astype(np.float64) / 255.0)
    tar_hsv = rgb_to_hsv(np.asarray(target, np.float64)[None, None] / 255.0)
    # hue and saturation follow the target; value (brightness) is preserved
    np.testing.assert_allclose(got_hsv[..., 0], float(tar_hsv[0, 0, 0]),
                               atol=0.02)
    np.testing.assert_allclose(got_hsv[..., 1], float(tar_hsv[0, 0, 1]),
                               atol=0.02)
    src_v = rgb_to_hsv(image.astype(np.float64) / 255.0)[..., 2]
    np.testing.assert_allclose(got_hsv[..., 2], src_v, atol=0.02)


def test_sharpen_is_identity_on_flat_images():
    flat = np.full((16, 16, 3), 128.0)
    out = sharpen(flat)
    np.testing.assert_allclose(out, flat, atol=1e-6)


def test_apply_makeup_spec_names():
    rng = np.random.RandomState(2)
    image = (rng.rand(16, 16, 3) * 255).astype(np.uint8)
    parsing = np.zeros((16, 16), np.int32)
    parsing[:8] = MAKEUP_PARTS["hair"]
    parsing[8:] = MAKEUP_PARTS["upper_lip"]
    out = apply_makeup(image, parsing,
                       {"hair": (10, 250, 10), "upper_lip": (230, 50, 20)})
    assert out.shape == image.shape and out.dtype == np.uint8
    assert not np.array_equal(out, image)
