"""Native fastio core vs numpy reference (bit-exactness where specified)."""
import numpy as np
import pytest

from mvsformerplusplus_tpu.data import native
from mvsformerplusplus_tpu.data.transforms import (
    IMAGENET_MEAN, IMAGENET_STD, stage_pyramid)


@pytest.mark.skipif(not native.available(), reason="libfastio.so not built")
def test_crop_normalize_matches_numpy():
    rng = np.random.RandomState(0)
    img = rng.rand(64, 96, 3).astype(np.float32)
    got = native.crop_normalize(img, 5, 7, 32, 48, gamma=1.05)
    patch = np.clip(img[5:37, 7:55], 0, 1) ** np.float32(1.05)
    ref = ((patch - IMAGENET_MEAN) / IMAGENET_STD).astype(np.float32)
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


@pytest.mark.skipif(not native.available(), reason="libfastio.so not built")
def test_u8_to_f32():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (33, 44, 3), np.uint8)
    np.testing.assert_allclose(native.u8_to_f32(img), img / 255.0, rtol=1e-6)


@pytest.mark.skipif(not native.available(), reason="libfastio.so not built")
def test_stage_pyramid_matches_cv2():
    rng = np.random.RandomState(2)
    arr = rng.rand(64, 96).astype(np.float32)
    got = native.stage_pyramid_native(arr)
    ref = stage_pyramid(arr)
    for k in ref:
        np.testing.assert_array_equal(got[k], ref[k])
