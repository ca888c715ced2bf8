"""Geometric-consistency depth fusion — the TPU replacement for the CUDA
fusibile/gipuma binary.

Implements both of the reference's torch filters as pure JAX (the
mathematical spec is misc/fusion.py — Vis-MVSNet-style — plus the drivers in
test.py:387-517):

- `pcd`: static thresholds — reproject every src depth map into the ref
  view, count views whose reprojection agrees within (pixel-dist,
  relative-depth) thresholds, average agreeing depths (misc/fusion.py:
  79-112).
- `dpcd`: dynamic per-count thresholds k/dist_base, k/rel_diff_base over v
  source views (misc/fusion.py:114-165) — the filter the reference itself
  uses for most Tanks&Temples scenes.

Conventions: pixel grid at (x+0.5, y+0.5) homogeneous (misc/fusion.py:8-13);
cameras are the [2, 4, 4] stacks. All fp32.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp

from ..ops.grid_sample import bilinear_sample

Array = jax.Array


def _pixel_grid_center(h: int, w: int) -> Array:
    """[H, W, 3] homogeneous (x+0.5, y+0.5, 1)."""
    y = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) + 0.5
    x = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) + 0.5
    return jnp.stack([x, y, jnp.ones_like(x)], axis=-1)


def _img2cam(xy1: Array, depth: Array, cam: Array) -> Array:
    """Pixel homogeneous [..., H, W, 3] + depth [..., H, W] -> cam-homo
    [..., H, W, 4] (misc/fusion.py:23-28)."""
    k_inv = jnp.linalg.inv(cam[..., 1, :3, :3])  # [..., 3, 3]
    pts = jnp.einsum("...ij,...hwj->...hwi", k_inv, xy1,
                     precision=jax.lax.Precision.HIGHEST)
    pts = pts / (pts[..., 2:3] + 1e-9) * depth[..., None]
    return jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], axis=-1)


def _cam2world(pts: Array, cam: Array) -> Array:
    e_inv = jnp.linalg.inv(cam[..., 0, :, :])
    out = jnp.einsum("...ij,...hwj->...hwi", e_inv, pts,
                     precision=jax.lax.Precision.HIGHEST)
    return out / (out[..., 3:4] + 1e-9)


def _world2cam(pts: Array, cam: Array) -> Array:
    out = jnp.einsum("...ij,...hwj->...hwi", cam[..., 0, :, :], pts,
                     precision=jax.lax.Precision.HIGHEST)
    return out / (out[..., 3:4] + 1e-9)


def _cam2img(pts: Array, cam: Array) -> Array:
    p3 = pts[..., :3] / (pts[..., 3:4] + 1e-9)
    out = jnp.einsum("...ij,...hwj->...hwi", cam[..., 1, :3, :3], p3,
                     precision=jax.lax.Precision.HIGHEST)
    return out / (out[..., 2:3] + 1e-9)


def reproject_dynamic(ref_depth: Array, src_depths: Array, ref_cam: Array,
                      src_cams: Array) -> Array:
    """ref->src->ref round trip (misc/fusion.py:114-150).

    ref_depth [H, W]; src_depths [V, H, W]; ref_cam [2,4,4];
    src_cams [V,2,4,4]. Returns reproj_xyd [V, H, W, 3]: the (x+0.5, y+0.5)
    ref-pixel coordinates and ref-frame depth of each src view's surface.
    """
    v, h, w = src_depths.shape
    xy1 = _pixel_grid_center(h, w)  # [H, W, 3]
    ref_cam_v = jnp.broadcast_to(ref_cam, (v, 2, 4, 4))
    ref_depth_v = jnp.broadcast_to(ref_depth, (v, h, w))

    # ref pixel -> world -> src image
    ref_cam_pts = _img2cam(xy1[None], ref_depth_v, ref_cam_v)
    world = _cam2world(ref_cam_pts, ref_cam_v)
    src_cam_pts = _world2cam(world, src_cams)
    src_img_pts = _cam2img(src_cam_pts, src_cams)  # [V, H, W, 3]

    # sample src depth at the projected position (align_corners=True pixel
    # coords: the reference normalizes by (w-1)/2 then grid_samples, which
    # round-trips to sampling at the raw pixel coordinate)
    coords = src_img_pts[..., :2]
    sampled = bilinear_sample(src_depths[..., None], coords)[..., 0]  # [V, H, W]

    # src pixel (+ sampled depth) -> world -> ref camera
    src_cam_pts2 = _img2cam(src_img_pts, sampled, src_cams)
    world2 = _cam2world(src_cam_pts2, src_cams)
    back_cam = _world2cam(world2, ref_cam_v)
    reproj_depth = back_cam[..., 2]
    back_img = _cam2img(back_cam, ref_cam_v)
    return jnp.concatenate([back_img[..., :2], reproj_depth[..., None]], axis=-1)


def vis_filter_dynamic(ref_depth: Array, reproj_xyd: Array,
                       dist_base: float = 4.0, rel_diff_base: float = 1300.0):
    """Dynamic-consistency masks (misc/fusion.py:153-165).

    Returns masks [V, V-1, H, W] (view v consistent at relaxation level k)
    and the per-view strictest mask [V, H, W].
    """
    v, h, w, _ = reproj_xyd.shape
    xy = _pixel_grid_center(h, w)[..., :2]  # [H, W, 2]
    coord_diff = jnp.linalg.norm(reproj_xyd[..., :2] - xy[None], axis=-1)  # [V,H,W]
    depth_diff = jnp.abs(ref_depth[None] - reproj_xyd[..., 2]) / (ref_depth[None] + 1e-9)

    ks = jnp.arange(2, v + 1, dtype=jnp.float32)  # [V-1]
    dist_thr = ks / dist_base
    rel_thr = ks / rel_diff_base
    masks = (coord_diff[:, None] < dist_thr[None, :, None, None]) & (
        depth_diff[:, None] < rel_thr[None, :, None, None]
    )  # [V, V-1, H, W]
    return masks, masks[:, -1]


def dpcd_fuse(ref_depth: Array, ref_conf: Array, src_depths: Array,
              ref_cam: Array, src_cams: Array, conf_thresh: float = 0.5,
              dist_base: float = 4.0, rel_diff_base: float = 1300.0):
    """Full dpcd filter for one reference view (test.py:445-517).

    Returns (points [H, W, 3] world coords, mask [H, W] bool).
    """
    v = src_depths.shape[0]
    dy_range = v + 1
    reproj = reproject_dynamic(ref_depth, src_depths, ref_cam, src_cams)
    masks, vis_mask = vis_filter_dynamic(ref_depth, reproj, dist_base, rel_diff_base)

    reproj_depth = jnp.where(vis_mask, reproj[..., 2], 0.0)  # [V, H, W]
    geo_mask_sums = jnp.sum(masks.astype(jnp.int32), axis=0)  # [V-1, H, W]
    geo_mask_sum = jnp.sum(vis_mask.astype(jnp.int32), axis=0)  # [H, W]
    depth_avg = (jnp.sum(reproj_depth, axis=0) + ref_depth) / (geo_mask_sum + 1)

    geo_mask = geo_mask_sum >= dy_range
    for i in range(2, dy_range):
        geo_mask = geo_mask | (geo_mask_sums[i - 2] >= i)

    mask = geo_mask & (ref_conf > conf_thresh)

    h, w = ref_depth.shape
    xy1 = _pixel_grid_center(h, w)
    cam_pts = _img2cam(xy1, depth_avg, ref_cam)
    world = _cam2world(cam_pts, ref_cam)[..., :3]
    return world, mask


def reproject_static(ref_depth: Array, src_depths: Array, ref_cam: Array,
                     src_cams: Array):
    """src->ref reprojection for the static pcd filter (misc/fusion.py:
    79-96): project each src surface into world, then into the ref view;
    resample the (x, y, depth) triple at the ref's grid via the ref depth.

    Returns reproj_xyd [V, H, W, 3], in_range [V, H, W].
    """
    v, h, w = src_depths.shape
    xy1 = _pixel_grid_center(h, w)
    ref_cam_v = jnp.broadcast_to(ref_cam, (v, 2, 4, 4))
    ref_depth_v = jnp.broadcast_to(ref_depth, (v, h, w))

    # src pixel -> world -> ref image: per-src-pixel (x_ref, y_ref, d_ref)
    src_cam_pts = _img2cam(xy1[None], src_depths, src_cams)
    world = _cam2world(src_cam_pts, src_cams)
    ref_cam_pts = _world2cam(world, ref_cam_v)
    ref_img_pts = _cam2img(ref_cam_pts, ref_cam_v)
    xyd_src = jnp.concatenate(
        [ref_img_pts[..., :2], ref_cam_pts[..., 2:3]], axis=-1)  # [V, H, W, 3]

    # warp that field into the ref grid using the REF depth (project_img,
    # misc/fusion.py:50-65: normalization /width then *2-1 under
    # align_corners=True == sampling at x·(w-1)/w)
    ref_pts = _img2cam(xy1[None], ref_depth_v, ref_cam_v)
    ref_world = _cam2world(ref_pts, ref_cam_v)
    r2s_cam = _world2cam(ref_world, src_cams)
    r2s_img = _cam2img(r2s_cam, src_cams)
    wc = r2s_img[..., :2]
    xs = wc[..., 0] / w * (w - 1)
    ys = wc[..., 1] / h * (h - 1)
    in_range = (wc[..., 0] / w >= 0) & (wc[..., 0] / w <= 1) & \
               (wc[..., 1] / h >= 0) & (wc[..., 1] / h <= 1)
    coords = jnp.stack([xs, ys], axis=-1)
    reproj = bilinear_sample(xyd_src, coords)  # [V, H, W, 3]
    return reproj, in_range


def vis_filter_static(ref_depth: Array, reproj_xyd: Array, in_range: Array,
                      img_dist_thresh: float, depth_thresh: float,
                      vthresh: float):
    """Static thresholds (misc/fusion.py:99-107)."""
    h, w = ref_depth.shape
    xy = _pixel_grid_center(h, w)[..., :2]
    dist_ok = jnp.linalg.norm(reproj_xyd[..., :2] - xy[None], axis=-1) < img_dist_thresh
    depth_ok = jnp.abs(ref_depth[None] - reproj_xyd[..., 2]) < (
        jnp.maximum(ref_depth[None], reproj_xyd[..., 2]) * depth_thresh
    )
    masks = in_range & dist_ok & depth_ok  # [V, H, W]
    mask = jnp.sum(masks.astype(jnp.float32), axis=0) >= (vthresh - 1.1)
    return masks, mask


def pcd_fuse(ref_depth: Array, ref_conf: Array, src_depths: Array,
             src_confs: Array, ref_cam: Array, src_cams: Array,
             conf_thresh: float = 0.5, img_dist_thresh: float = 1.0,
             depth_thresh: float = 0.01, vthresh: float = 4.0):
    """Full static pcd filter for one reference view (test.py:387-442)."""
    src_depths = jnp.where(src_confs > conf_thresh, src_depths, 0.0)
    reproj, in_range = reproject_static(ref_depth, src_depths, ref_cam, src_cams)
    masks, vis_mask = vis_filter_static(
        ref_depth, reproj, in_range, img_dist_thresh, depth_thresh, vthresh)

    fused = (jnp.sum(reproj[..., 2] * masks, axis=0) + ref_depth) / (
        jnp.sum(masks.astype(jnp.float32), axis=0) + 1
    )
    mask = vis_mask & (ref_conf > conf_thresh)

    h, w = ref_depth.shape
    xy1 = _pixel_grid_center(h, w)
    cam_pts = _img2cam(xy1, fused, ref_cam)
    world = _cam2world(cam_pts, ref_cam)[..., :3]
    return world, mask


def gipuma_fuse(ref_depth: Array, ref_conf: Array, src_depths: Array,
                src_confs: Array, ref_cam: Array, src_cams: Array,
                prob_threshold: float = 0.5, disp_threshold: float = 0.1,
                num_consistent: int = 3):
    """Fusibile/gipuma-semantics consistency fusion for one reference view.

    TPU-native replacement for the external CUDA fusibile binary the
    reference shells out to (misc/gipuma.py:184-205 builds the command;
    README.md:91-96 defines the DTU protocol on its output: disp 0.1,
    num_consistent 2-3, prob 0.5). Semantics follow the fusibile pipeline as
    driven by misc/gipuma.py:

    - probability filter FIRST: every view's depth is zeroed where its
      confidence <= prob_threshold (probability_filter writes
      ``*_prob_filtered.pfm``, misc/gipuma.py:160-181) — zero depth means
      "no surface", never consistent;
    - a source view is consistent when the ref pixel's 3D point, projected
      into that view, lands on a pixel whose filtered depth agrees with the
      projected depth within ``|z_proj - d_src| < disp_threshold``. The
      threshold is in ABSOLUTE depth units: the .dmb "disp" maps fusibile
      consumes hold raw mvsnet depths, converted unchanged
      (mvsnet_to_gipuma_dmb, misc/gipuma.py:64-68);
    - depth lookup is NEAREST-pixel (fusibile indexes the map at the integer
      pixel, no interpolation);
    - a ref pixel with >= num_consistent consistent source views emits one
      fused point: the mean of the ref world point and the consistent source
      world points (fusibile averages the supporting 3D points into the
      output cloud).

    Args:
      ref_depth/ref_conf: [H, W]. src_depths/src_confs: [V, H, W].
      ref_cam: [2, 4, 4]; src_cams: [V, 2, 4, 4].

    Returns:
      points [H, W, 3] fused world points, mask [H, W] bool,
      consistent [V, H, W] bool (per-source support, for the driver's
      duplicate suppression), src_px [V, H, W, 2] int32 (x, y) nearest
      source pixel each ref pixel projected to.
    """
    v, h, w = src_depths.shape
    src_depths = jnp.where(src_confs > prob_threshold, src_depths, 0.0)
    ref_valid = (ref_conf > prob_threshold) & (ref_depth > 0)

    xy1 = _pixel_grid_center(h, w)
    ref_pts = _img2cam(xy1, ref_depth, ref_cam)
    ref_world = _cam2world(ref_pts, ref_cam)  # [H, W, 4]

    src_cam_pts = _world2cam(
        jnp.broadcast_to(ref_world, (v, h, w, 4)), src_cams)  # [V, H, W, 4]
    z_proj = src_cam_pts[..., 2]
    img_pts = _cam2img(src_cam_pts, src_cams)  # [V, H, W, 3]
    # pixel-center convention: pixel (i, j) covers [j, j+1) x [i, i+1), so
    # the nearest-pixel index is floor(u)
    ux = jnp.floor(img_pts[..., 0]).astype(jnp.int32)
    uy = jnp.floor(img_pts[..., 1]).astype(jnp.int32)
    in_bounds = (ux >= 0) & (ux < w) & (uy >= 0) & (uy < h) & (z_proj > 0)
    uxc = jnp.clip(ux, 0, w - 1)
    uyc = jnp.clip(uy, 0, h - 1)

    flat_idx = uyc * w + uxc  # [V, H, W]
    d_src = jax.vmap(lambda dm, ix: dm.reshape(-1)[ix])(
        src_depths, flat_idx)  # [V, H, W]

    consistent = in_bounds & (d_src > 0) & (
        jnp.abs(z_proj - d_src) < disp_threshold)

    # world point of the supporting source pixel (its own surface estimate)
    sxy1 = jnp.stack([uxc.astype(jnp.float32) + 0.5,
                      uyc.astype(jnp.float32) + 0.5,
                      jnp.ones_like(z_proj)], axis=-1)  # [V, H, W, 3]
    src_pts = _img2cam(sxy1, d_src, src_cams)
    src_world = _cam2world(src_pts, src_cams)[..., :3]  # [V, H, W, 3]

    cnt = jnp.sum(consistent.astype(jnp.float32), axis=0)  # [H, W]
    mask = ref_valid & (cnt >= num_consistent)

    fused = (ref_world[..., :3] +
             jnp.sum(src_world * consistent[..., None], axis=0)) / (
        cnt[..., None] + 1.0)
    src_px = jnp.stack([uxc, uyc], axis=-1)
    return fused, mask, consistent, src_px
