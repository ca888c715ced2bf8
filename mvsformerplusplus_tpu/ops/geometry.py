"""Camera geometry for plane-sweep multi-view stereo — pure JAX, fp32.

Conventions (kept wire-compatible with the reference data format so datasets
interchange; see reference models/warping.py:69-109 and
models/cost_volume.py:68-71 for the behaviour being re-designed here):

- A "camera" is a pair (extrinsic 4x4 world->cam, intrinsic 3x3). On disk and
  in batches we carry them as a [..., 2, 4, 4] stack where [..., 0, :, :] is
  the extrinsic and [..., 1, :3, :3] the intrinsic (reference
  datasets/dtu_dataset_ms.py:340-353).
- Pixel coordinates are (x, y) with x along width; pixel (0, 0) is the center
  of the top-left pixel (align_corners=True convention).
- All geometry runs in float32 regardless of the surrounding compute dtype
  (reference keeps an fp32 autocast island around warping,
  models/cost_volume.py:64).

Everything here is shape-polymorphic pure functions; no module state.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def compose_projection(cam: Array) -> Array:
    """[..., 2, 4, 4] camera stack -> single 4x4 projection K·E.

    Mirrors reference models/cost_volume.py:68-71: proj[:3, :4] = K @ E[:3, :4],
    last row kept from the extrinsic (0,0,0,1).
    """
    cam = cam.astype(jnp.float32)
    ext = cam[..., 0, :, :]
    intr = cam[..., 1, :3, :3]
    top = jnp.matmul(intr, ext[..., :3, :4], precision=jax.lax.Precision.HIGHEST)
    return jnp.concatenate([top, ext[..., 3:4, :4]], axis=-2)


def pixel_grid(height: int, width: int, homogeneous: bool = True) -> Array:
    """Homogeneous pixel coordinates [3, H*W] (rows x, y, 1), float32."""
    y = jax.lax.broadcasted_iota(jnp.float32, (height, width), 0)
    x = jax.lax.broadcasted_iota(jnp.float32, (height, width), 1)
    ones = jnp.ones_like(x)
    rows = [x.reshape(-1), y.reshape(-1)]
    if homogeneous:
        rows.append(ones.reshape(-1))
    return jnp.stack(rows, axis=0)


def plane_sweep_coords(
    src_proj: Array,
    ref_proj: Array,
    depth_values: Array,
    height: int,
    width: int,
):
    """Project every ref pixel at every depth hypothesis into the src image.

    Args:
      src_proj: [B, 4, 4] composed src projection (see compose_projection).
      ref_proj: [B, 4, 4] composed ref projection.
      depth_values: [B, D] or [B, D, H, W] depth hypotheses.
      height, width: ref/src feature resolution (they share resolution).

    Returns:
      coords: [B, D, H, W, 2] (x, y) sample positions in src pixel units.
      invalid: [B, D, H, W] bool — True where the projection leaves the image
        (|x_norm|>1 or |y_norm|>1) or lands behind the camera (z <= 0).
        Matches reference models/warping.py:99-103.

    The projective math follows reference models/warping.py:79-97 exactly
    (including the +1e-6 in the perspective divide), but never builds the
    [-1, 1]-normalized grid: grid_sample's normalize/denormalize round-trip is
    the identity under align_corners=True, so we keep raw pixel coordinates
    and feed them straight to the bilinear gather.
    """
    b = src_proj.shape[0]
    d = depth_values.shape[1]
    proj = jnp.matmul(
        src_proj.astype(jnp.float32),
        jnp.linalg.inv(ref_proj.astype(jnp.float32)),
        precision=jax.lax.Precision.HIGHEST,
    )
    rot = proj[:, :3, :3]
    trans = proj[:, :3, 3]

    xyz = pixel_grid(height, width)  # [3, HW]
    rot_xyz = jnp.einsum("bij,jn->bin", rot, xyz, precision=jax.lax.Precision.HIGHEST)  # [B, 3, HW]
    depth = depth_values.astype(jnp.float32).reshape(b, 1, d, -1)
    # [B, 3, D, HW]; depth broadcasts over HW when given as [B, D].
    proj_xyz = rot_xyz[:, :, None, :] * depth + trans[:, :, None, None]
    z = proj_xyz[:, 2]
    proj_xy = proj_xyz[:, :2] / (z[:, None] + 1e-6)

    x = proj_xy[:, 0]
    y = proj_xy[:, 1]
    x_norm = x / ((width - 1) / 2) - 1
    y_norm = y / ((height - 1) / 2) - 1
    invalid = (jnp.abs(x_norm) > 1) | (jnp.abs(y_norm) > 1) | (z <= 0)

    coords = jnp.stack([x, y], axis=-1).reshape(b, d, height, width, 2)
    invalid = invalid.reshape(b, d, height, width)
    return coords, invalid


def lift(x: Array, y: Array, z: Array, intrinsics: Array, homogeneous: bool = False) -> Array:
    """Unproject pixel coords (x, y) at depth z into camera space.

    x, y, z: [B, N]; intrinsics: [B, 3, 3]. Returns [B, N, 3] (or [..., 4]).
    Reference models/warping.py:23-41.
    """
    fx = intrinsics[:, 0, 0][:, None]
    fy = intrinsics[:, 1, 1][:, None]
    cx = intrinsics[:, 0, 2][:, None]
    cy = intrinsics[:, 1, 2][:, None]
    x_lift = (x - cx) / fx * z
    y_lift = (y - cy) / fy * z
    parts = [x_lift, y_lift, z]
    if homogeneous:
        parts.append(jnp.ones_like(z))
    return jnp.stack(parts, axis=-1)


def world_from_xy_depth(xy: Array, depth: Array, cam2world: Array, intrinsics: Array) -> Array:
    """Pixel (x, y) + depth -> world XYZ. Reference models/warping.py:44-66.

    xy: [B, N, 2], depth: [B, N], cam2world: [B, 4, 4], intrinsics: [B, 3, 3].
    """
    pts_cam = lift(xy[..., 0], xy[..., 1], depth, intrinsics, homogeneous=True)
    world = jnp.einsum("bij,bnj->bni", cam2world, pts_cam, precision=jax.lax.Precision.HIGHEST)
    return world[..., :3]


def get_position_3d(
    intrinsics: Array,
    depth_values: Array,
    height: int,
    width: int,
    depth_min: Array,
    depth_max: Array,
    bounds=None,
):
    """Normalized camera-space XYZ per (depth, pixel) for the 3D PE.

    Reference models/position_encoding.py:138-161: unproject pixels with
    K^-1 · [x, y, 1] · d, then min-max normalize x/y (bounds computed at
    stage 1 and reused by later stages) and clamp-normalize z by the scene
    depth range.

    Args:
      intrinsics: [B, 3, 3].
      depth_values: [B, D] or [B, D, H, W].
      bounds: optional (width_min, width_max, height_min, height_max) from an
        earlier stage; computed from this stage's positions when None.

    Returns:
      position3d: [B, 3, D, H, W] in [0, 1], stopped gradients.
      bounds: tuple to pass to later stages.
    """
    b = intrinsics.shape[0]
    d = depth_values.shape[1]
    xyz = pixel_grid(height, width)  # [3, HW]
    k_inv = jnp.linalg.inv(intrinsics.astype(jnp.float32))
    cam_rays = jnp.einsum("bij,jn->bin", k_inv, xyz, precision=jax.lax.Precision.HIGHEST)  # [B, 3, HW]
    depth = depth_values.astype(jnp.float32).reshape(b, 1, d, -1)
    pos = cam_rays[:, :, None, :] * depth  # [B, 3, D, HW]

    if bounds is None:
        w_min, w_max = pos[:, 0].min(), pos[:, 0].max()
        h_min, h_max = pos[:, 1].min(), pos[:, 1].max()
        bounds = (w_min, w_max, h_min, h_max)
    w_min, w_max, h_min, h_max = bounds

    px = (pos[:, 0] - w_min) / (w_max - w_min + 1e-5)
    py = (pos[:, 1] - h_min) / (h_max - h_min + 1e-5)
    pz = (jnp.clip(pos[:, 2], depth_min, depth_max) - depth_min) / (
        depth_max - depth_min + 1e-5
    )
    position3d = jnp.stack([px, py, pz], axis=1).reshape(b, 3, d, height, width)
    return jax.lax.stop_gradient(position3d), bounds
