"""Golden-value tests: matmul-resizes vs torch F.interpolate."""
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from mvsformerplusplus_tpu.ops import resize2d, resize_hw_axes


def _torch_resize(x_nhwc, out_h, out_w, mode, align_corners):
    t = torch.from_numpy(np.moveaxis(x_nhwc, -1, 1))
    if mode == "nearest":
        y = TF.interpolate(t, size=(out_h, out_w), mode="nearest")
    else:
        y = TF.interpolate(t, size=(out_h, out_w), mode=mode, align_corners=align_corners)
    return np.moveaxis(y.numpy(), 1, -1)


CASES = [
    ("linear", True, (17, 23), (34, 46)),
    ("linear", True, (16, 20), (32, 40)),
    ("linear", False, (17, 23), (34, 46)),
    ("linear", False, (30, 40), (17, 23)),
    ("cubic", False, (16, 24), (7, 11)),
    ("cubic", False, (14, 14), (37, 37)),
    ("nearest", False, (33, 47), (17, 23)),
]


@pytest.mark.parametrize("method,align,in_hw,out_hw", CASES)
def test_resize2d_matches_torch(method, align, in_hw, out_hw):
    rng = np.random.RandomState(0)
    x = rng.randn(2, *in_hw, 3).astype(np.float32)
    mode = {"linear": "bilinear", "cubic": "bicubic", "nearest": "nearest"}[method]
    ref = _torch_resize(x, *out_hw, mode, align)
    got = np.asarray(resize2d(x, *out_hw, method=method, align_corners=align))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_trilinear_same_depth_axis_matches_torch():
    """Reference upsamples [B,1,D,h,w] volumes trilinear align_corners=True to
    [D,H,W]; with D unchanged that must equal per-slice bilinear."""
    rng = np.random.RandomState(1)
    b, d, h, w = 2, 8, 9, 13
    x = rng.randn(b, d, h, w).astype(np.float32)
    t = torch.from_numpy(x)[:, None]
    ref = TF.interpolate(t, size=(d, h * 2, w * 2), mode="trilinear", align_corners=True)[:, 0].numpy()
    got = np.asarray(
        resize_hw_axes(x, h * 2, w * 2, h_axis=-2, w_axis=-1, method="linear", align_corners=True)
    )
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_upsample_x2_scale_factor_path():
    """FPN decoder uses scale_factor=2 bilinear align_corners=True; same as
    size-based resize for align_corners=True."""
    rng = np.random.RandomState(2)
    x = rng.randn(1, 12, 18, 4).astype(np.float32)
    t = torch.from_numpy(np.moveaxis(x, -1, 1))
    ref = np.moveaxis(
        TF.interpolate(t, scale_factor=2, mode="bilinear", align_corners=True).numpy(), 1, -1
    )
    got = np.asarray(resize2d(x, 24, 36, method="linear", align_corners=True))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
