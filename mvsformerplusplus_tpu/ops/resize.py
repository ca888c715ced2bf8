"""Image/volume resizing as separable interpolation matmuls.

TPU-first design note: torch-style `F.interpolate` is a gather at heart;
gathers are the weakest op class on TPU while matmuls are the strongest. A
1-D interpolation (linear or cubic, either corner convention) is a fixed
sparse matrix; applying it along H then W turns any separable resize into two
dense matmuls that ride the MXU and fuse with neighbouring ops. We therefore
build explicit [out, in] interpolation matrices (cached per shape under jit
tracing by virtue of being shape-only functions of static ints).

Numerics match torch exactly:
- `align_corners=True`: in_coord = out_i * (in-1)/(out-1)
- `align_corners=False` (half-pixel): in_coord = (out_i + 0.5) * in/out - 0.5,
  clamped edge for linear; cubic uses Keys a=-0.75 with edge clamping.

Used for: FPN decoder upsample (bilinear, align_corners=True — reference
models/module.py:261-267), FMT pathway upsample (bilinear, align_corners=False
— reference models/FMT.py:162), ViT input resize + DINOv2 pos-embed interp
(bicubic, align_corners=False — reference models/networks/
DINOv2_mvsformer_model.py:76, models/dino/dinov2.py:176-200), depth-hypothesis
trilinear upsample (align_corners=True — reference models/module.py:723).
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@lru_cache(maxsize=None)
def _interp_matrix_np(in_size: int, out_size: int, method: str, align_corners: bool,
                      scale: float = None) -> np.ndarray:
    """[out_size, in_size] float32 row-stochastic interpolation matrix.

    `scale`: explicit coordinate-transform scale, matching torch's
    F.interpolate(scale_factor=s) semantics (src = (dst+0.5)/s - 0.5) —
    subtly different from the size-ratio rule and needed e.g. for DINOv2's
    pos-embed interpolation with its +0.1 fudge (dinov2.py:192-197).
    """
    if in_size == out_size and scale is None:
        return np.eye(out_size, dtype=np.float32)
    out_i = np.arange(out_size, dtype=np.float64)
    if scale is not None:
        src = (out_i + 0.5) / scale - 0.5
    elif align_corners:
        if out_size == 1:
            src = np.zeros_like(out_i)
        else:
            src = out_i * (in_size - 1) / (out_size - 1)
    else:
        src = (out_i + 0.5) * in_size / out_size - 0.5

    mat = np.zeros((out_size, in_size), dtype=np.float64)
    if method == "nearest":
        # torch 'nearest' floor rule: src index = floor(out_i * in/out)
        idx = np.floor(out_i * in_size / out_size).astype(np.int64)
        idx = np.clip(idx, 0, in_size - 1)
        mat[np.arange(out_size), idx] = 1.0
    elif method == "linear":
        x0 = np.floor(src).astype(np.int64)
        frac = src - x0
        for tap, w in ((x0, 1 - frac), (x0 + 1, frac)):
            t = np.clip(tap, 0, in_size - 1)
            np.add.at(mat, (np.arange(out_size), t), w)
    elif method == "cubic":
        # Keys cubic kernel, a = -0.75 (torch/OpenCV convention).
        a = -0.75

        def k(x):
            x = np.abs(x)
            r = np.where(
                x <= 1,
                (a + 2) * x**3 - (a + 3) * x**2 + 1,
                np.where(x < 2, a * x**3 - 5 * a * x**2 + 8 * a * x - 4 * a, 0.0),
            )
            return r

        x0 = np.floor(src).astype(np.int64)
        frac = src - x0
        for offset in (-1, 0, 1, 2):
            tap = x0 + offset
            w = k(frac - offset)
            t = np.clip(tap, 0, in_size - 1)
            np.add.at(mat, (np.arange(out_size), t), w)
    else:
        raise ValueError(f"unknown resize method {method}")
    return mat.astype(np.float32)


def interp_matrix(in_size: int, out_size: int, method: str = "linear",
                  align_corners: bool = False, scale: float = None) -> Array:
    return jnp.asarray(_interp_matrix_np(in_size, out_size, method, align_corners, scale))


@partial(jax.jit, static_argnames=("out_h", "out_w", "method", "align_corners", "scale_h", "scale_w"))
def resize2d(x: Array, out_h: int, out_w: int, method: str = "linear",
             align_corners: bool = False, scale_h: float = None,
             scale_w: float = None) -> Array:
    """Resize [..., H, W, C] to [..., out_h, out_w, C] via separable matmuls.

    fp32 inputs interpolate in fp32 at HIGHEST precision (matching the
    reference's `.to(float32)` before every interpolate — the parity-test
    path, and the one every fp32 PARAMETER interpolation takes, e.g. the
    DINOv2 pos-embed resize; a call site that needs exactness on bf16 data
    opts in by casting its input to fp32). bf16 inputs interpolate in bf16
    with fp32 accumulation: the
    weight rounding (<=0.4%/tap) is below the bf16 feature quantization,
    while fp32-HIGHEST on TPU is a 6-pass bf16x3 matmul decomposition plus
    two full-tensor converts — measured 65 ms/map of the DTU eval forward
    in the FPN decoder's x8 upsample chain alone.
    """
    h, w = x.shape[-3], x.shape[-2]
    if h == out_h and w == out_w and scale_h is None and scale_w is None:
        return x
    dtype = x.dtype
    mh = interp_matrix(h, out_h, method, align_corners, scale_h)  # [out_h, h]
    mw = interp_matrix(w, out_w, method, align_corners, scale_w)  # [out_w, w]
    if dtype == jnp.bfloat16:
        y = jnp.einsum("Oh,...hwc->...Owc", mh.astype(dtype), x,
                       preferred_element_type=jnp.float32).astype(dtype)
        y = jnp.einsum("Pw,...hwc->...hPc", mw.astype(dtype), y,
                       preferred_element_type=jnp.float32)
        return y.astype(dtype)
    xf = x.astype(jnp.float32)
    y = jnp.einsum("Oh,...hwc->...Owc", mh, xf, precision=jax.lax.Precision.HIGHEST)
    y = jnp.einsum("Pw,...hwc->...hPc", mw, y, precision=jax.lax.Precision.HIGHEST)
    return y.astype(dtype)


def resize_hw_axes(x: Array, out_h: int, out_w: int, h_axis: int, w_axis: int,
                   method: str = "linear", align_corners: bool = False) -> Array:
    """Resize arbitrary axes of an ND array (e.g. [B, D, H, W] volumes)."""
    x = jnp.moveaxis(x, (h_axis, w_axis), (-2, -1))
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mh = interp_matrix(x.shape[-2], out_h, method, align_corners)
    mw = interp_matrix(x.shape[-1], out_w, method, align_corners)
    y = jnp.einsum("Oh,...hw->...Ow", mh, xf, precision=jax.lax.Precision.HIGHEST)
    y = jnp.einsum("Pw,...hw->...hP", mw, y, precision=jax.lax.Precision.HIGHEST)
    y = y.astype(orig_dtype)
    return jnp.moveaxis(y, (-2, -1), (h_axis, w_axis))
