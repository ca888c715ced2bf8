"""Bilinear sampling at scattered coordinates + the plane-sweep warp.

This is the hottest op of the whole pipeline (SURVEY.md §3.3: grid_sample
warp ranks #1), re-designed for TPU:

- coordinates are kept in *pixel units* end-to-end (the [-1, 1] normalize /
  denormalize round-trip of torch's grid_sample under align_corners=True is
  the identity, so we never do it);
- the 4-corner bilinear blend is expressed as one flattened gather over H*W
  with per-corner in-bounds masks, which XLA lowers to TPU dynamic-gather;
  a fused Pallas kernel (ops/pallas/warp.py) replaces it on the hot path;
- everything runs in fp32 (reference fp32 island, models/cost_volume.py:64)
  and the coordinate computation is gradient-stopped, matching
  homo_warping_3D_with_mask (reference models/warping.py:79, torch.no_grad).

Semantics match torch.nn.functional.grid_sample(mode='bilinear',
padding_mode='zeros', align_corners=True) exactly: corners that fall outside
the image contribute zero with their bilinear weight (partial blending at the
border), verified golden-value against torch in tests/test_grid_sample.py.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .geometry import compose_projection, plane_sweep_coords

Array = jax.Array


def bilinear_sample(img: Array, coords: Array) -> Array:
    """Sample img at scattered (x, y) pixel coordinates, zeros padding.

    Args:
      img: [B, H, W, C].
      coords: [B, ..., 2] pixel-unit (x, y); align_corners=True convention
        (coordinate i is the center of pixel i, valid range [0, size-1]).

    Returns:
      [B, ..., C] sampled values, fp32.
    """
    b, h, w, c = img.shape
    img = img.astype(jnp.float32)
    out_shape = coords.shape[:-1] + (c,)
    xy = coords.reshape(b, -1, 2).astype(jnp.float32)
    x, y = xy[..., 0], xy[..., 1]

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0

    flat = img.reshape(b, h * w, c)

    def corner(xi, yi, wgt):
        inb = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        idx = yi_c * w + xi_c  # [B, N]
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1)  # [B, N, C]
        return vals * (wgt * inb.astype(jnp.float32))[..., None]

    out = (
        corner(x0, y0, (1 - fx) * (1 - fy))
        + corner(x0 + 1, y0, fx * (1 - fy))
        + corner(x0, y0 + 1, (1 - fx) * fy)
        + corner(x0 + 1, y0 + 1, fx * fy)
    )
    return out.reshape(out_shape)


def homography_warp(
    src_feat: Array,
    src_proj: Array,
    ref_proj: Array,
    depth_values: Array,
    stop_coord_grad: bool = True,
):
    """Plane-sweep warp of src features into the ref frustum.

    Args:
      src_feat: [B, H, W, C] source-view features (any float dtype; warping
        runs fp32).
      src_proj / ref_proj: [B, 4, 4] composed projections (K·E), see
        geometry.compose_projection.
      depth_values: [B, D] or [B, D, H, W] depth hypotheses.
      stop_coord_grad: gradient-stop the warp coordinates (reference default
        homo_warping_3D_with_mask; False gives the diff_ variant,
        models/warping.py:112-152).

    Returns:
      warped: [B, D, H, W, C] fp32.
      invalid: [B, D, H, W] bool mask (outside FOV or behind camera).
    """
    b, h, w, _ = src_feat.shape
    coords, invalid = plane_sweep_coords(src_proj, ref_proj, depth_values, h, w)
    if stop_coord_grad:
        coords = jax.lax.stop_gradient(coords)
        invalid = jax.lax.stop_gradient(invalid)
    warped = bilinear_sample(src_feat, coords)
    return warped, invalid


def homography_warp_cams(
    src_feat: Array,
    src_cam: Array,
    ref_cam: Array,
    depth_values: Array,
    **kwargs,
):
    """Convenience wrapper taking [B, 2, 4, 4] camera stacks."""
    return homography_warp(
        src_feat,
        compose_projection(src_cam),
        compose_projection(ref_cam),
        depth_values,
        **kwargs,
    )
