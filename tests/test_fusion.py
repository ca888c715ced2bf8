"""Fusion filter properties: perfectly consistent depth maps fuse losslessly;
inconsistent views are rejected."""
import numpy as np
import pytest

import jax.numpy as jnp

from mvsformerplusplus_tpu.fusion.fusion import (
    dpcd_fuse,
    gipuma_fuse,
    pcd_fuse,
    reproject_dynamic,
    vis_filter_dynamic,
)
from mvsformerplusplus_tpu.data.io import build_camera_stack


def make_cam(angle, tx, h, w, f=80.0):
    c, s = np.cos(angle), np.sin(angle)
    ext = np.eye(4, dtype=np.float32)
    ext[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
    ext[0, 3] = tx
    intr = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], np.float32)
    return build_camera_stack(intr, ext)


def render_plane_depths(cams, h, w, plane_z=5.0):
    """Depth maps of the world plane z=plane_z for each camera (fronto-
    parallel for identity-rotation cams; computed exactly via ray casting)."""
    depths = []
    for cam in cams:
        E = cam[0]
        K = cam[1, :3, :3]
        Kinv = np.linalg.inv(K)
        Einv = np.linalg.inv(E)
        y, x = np.mgrid[0:h, 0:w].astype(np.float32)
        pix = np.stack([x + 0.5, y + 0.5, np.ones_like(x)], axis=-1)  # match fusion grid
        rays_cam = pix @ Kinv.T
        rays_world = rays_cam @ Einv[:3, :3].T
        origin = Einv[:3, 3]
        t = (plane_z - origin[2]) / rays_world[..., 2]
        depths.append(t.astype(np.float32))  # depth = z_cam of the hit = t * ray_z_cam(=1)... see below
    return depths


def test_dpcd_consistent_views_all_pass():
    h, w, v = 32, 40, 4
    ref_cam = make_cam(0.0, 0.0, h, w)
    src_cams = np.stack([make_cam(0.004 * (i + 1), 0.06 * (i + 1), h, w) for i in range(v)])

    # geometry: a world plane z=5; ref camera is identity so its depth map is
    # analytic; src depths rendered by ray casting through each src camera
    all_cams = [ref_cam] + [src_cams[i] for i in range(v)]
    depths = []
    for cam in all_cams:
        E = cam[0]
        K = cam[1, :3, :3]
        Kinv = np.linalg.inv(K)
        Einv = np.linalg.inv(E)
        y, x = np.mgrid[0:h, 0:w].astype(np.float32)
        pix = np.stack([x + 0.5, y + 0.5, np.ones_like(x)], axis=-1)
        rays_cam = pix @ Kinv.T  # z=1 rays in cam frame
        rays_world = rays_cam @ Einv[:3, :3].T
        origin = Einv[:3, 3]
        t = (5.0 - origin[2]) / rays_world[..., 2]
        # depth (z in cam frame) of the intersection = t * (cam-frame ray z) = t
        depths.append(t.astype(np.float32))

    ref_depth = depths[0]
    src_depths = np.stack(depths[1:])
    ref_conf = np.ones((h, w), np.float32)

    pts, mask = dpcd_fuse(
        jnp.asarray(ref_depth), jnp.asarray(ref_conf), jnp.asarray(src_depths),
        jnp.asarray(ref_cam), jnp.asarray(src_cams), conf_thresh=0.5,
    )
    mask = np.asarray(mask)
    pts = np.asarray(pts)
    # interior pixels (away from src-FOV boundary effects) must pass
    inner = mask[8:-8, 8:-8]
    assert inner.mean() > 0.9, f"only {inner.mean():.2f} of interior fused"
    # fused points must lie on the z=5 plane
    z = pts[8:-8, 8:-8, 2][inner]
    np.testing.assert_allclose(z, 5.0, atol=0.05)


def test_dpcd_inconsistent_views_rejected():
    h, w, v = 32, 40, 4
    ref_cam = make_cam(0.0, 0.0, h, w)
    src_cams = np.stack([make_cam(0.004 * (i + 1), 0.06 * (i + 1), h, w) for i in range(v)])
    ref_depth = np.full((h, w), 5.0, np.float32)
    rng = np.random.RandomState(0)
    src_depths = rng.uniform(1.0, 2.0, (v, h, w)).astype(np.float32)  # way off
    ref_conf = np.ones((h, w), np.float32)
    _, mask = dpcd_fuse(
        jnp.asarray(ref_depth), jnp.asarray(ref_conf), jnp.asarray(src_depths),
        jnp.asarray(ref_cam), jnp.asarray(src_cams))
    assert np.asarray(mask).mean() < 0.05


def test_pcd_consistent_plane():
    h, w, v = 32, 40, 3
    ref_cam = make_cam(0.0, 0.0, h, w)
    src_cams = np.stack([make_cam(0.004 * (i + 1), 0.05 * (i + 1), h, w) for i in range(v)])
    all_cams = [ref_cam] + [src_cams[i] for i in range(v)]
    depths = []
    for cam in all_cams:
        E, K = cam[0], cam[1, :3, :3]
        Kinv, Einv = np.linalg.inv(K), np.linalg.inv(E)
        y, x = np.mgrid[0:h, 0:w].astype(np.float32)
        pix = np.stack([x + 0.5, y + 0.5, np.ones_like(x)], axis=-1)
        rays_world = (pix @ Kinv.T) @ Einv[:3, :3].T
        origin = Einv[:3, 3]
        depths.append(((5.0 - origin[2]) / rays_world[..., 2]).astype(np.float32))
    ref_depth, src_depths = depths[0], np.stack(depths[1:])
    conf = np.ones((h, w), np.float32)
    pts, mask = pcd_fuse(
        jnp.asarray(ref_depth), jnp.asarray(conf), jnp.asarray(src_depths),
        jnp.asarray(np.ones((v, h, w), np.float32)), jnp.asarray(ref_cam),
        jnp.asarray(src_cams), conf_thresh=0.5, img_dist_thresh=1.0,
        depth_thresh=0.01, vthresh=3.0)
    inner = np.asarray(mask)[8:-8, 8:-8]
    assert inner.mean() > 0.9
    z = np.asarray(pts)[8:-8, 8:-8, 2][inner]
    np.testing.assert_allclose(z, 5.0, atol=0.05)


def _plane_scene(h=32, w=40, v=4):
    ref_cam = make_cam(0.0, 0.0, h, w)
    src_cams = np.stack(
        [make_cam(0.004 * (i + 1), 0.06 * (i + 1), h, w) for i in range(v)])
    all_cams = [ref_cam] + [src_cams[i] for i in range(v)]
    depths = []
    for cam in all_cams:
        E, K = cam[0], cam[1, :3, :3]
        Kinv, Einv = np.linalg.inv(K), np.linalg.inv(E)
        y, x = np.mgrid[0:h, 0:w].astype(np.float32)
        pix = np.stack([x + 0.5, y + 0.5, np.ones_like(x)], axis=-1)
        rays_world = (pix @ Kinv.T) @ Einv[:3, :3].T
        origin = Einv[:3, 3]
        depths.append(((5.0 - origin[2]) / rays_world[..., 2]).astype(np.float32))
    return ref_cam, src_cams, depths[0], np.stack(depths[1:])


def test_gipuma_consistent_plane():
    """Fusibile-semantics fusion keeps a geometrically consistent scene and
    its fused points lie on the true surface."""
    h, w, v = 32, 40, 4
    ref_cam, src_cams, ref_depth, src_depths = _plane_scene(h, w, v)
    conf = np.ones((h, w), np.float32)
    pts, mask, consistent, _ = gipuma_fuse(
        jnp.asarray(ref_depth), jnp.asarray(conf), jnp.asarray(src_depths),
        jnp.asarray(np.ones((v, h, w), np.float32)), jnp.asarray(ref_cam),
        jnp.asarray(src_cams), prob_threshold=0.5, disp_threshold=0.05,
        num_consistent=3)
    inner = np.asarray(mask)[8:-8, 8:-8]
    assert inner.mean() > 0.9, f"only {inner.mean():.2f} interior kept"
    z = np.asarray(pts)[8:-8, 8:-8, 2][inner]
    np.testing.assert_allclose(z, 5.0, atol=0.05)
    # every interior ref pixel should be supported by most sources
    assert np.asarray(consistent)[:, 8:-8, 8:-8].mean() > 0.8


def test_gipuma_disp_threshold_and_prob_filter():
    """disp_threshold is an ABSOLUTE depth tolerance and the probability
    filter removes low-confidence sources (misc/gipuma.py:160-181)."""
    h, w, v = 32, 40, 4
    ref_cam, src_cams, ref_depth, src_depths = _plane_scene(h, w, v)
    conf = np.ones((h, w), np.float32)
    src_confs = np.ones((v, h, w), np.float32)

    # offset two source depth maps by more than disp_threshold -> with
    # num_consistent=3 only 2 consistent views remain -> nothing passes
    bad = src_depths.copy()
    bad[0] += 0.2
    bad[1] -= 0.2
    _, mask, consistent, _ = gipuma_fuse(
        jnp.asarray(ref_depth), jnp.asarray(conf), jnp.asarray(bad),
        jnp.asarray(src_confs), jnp.asarray(ref_cam), jnp.asarray(src_cams),
        prob_threshold=0.5, disp_threshold=0.05, num_consistent=3)
    assert np.asarray(mask).mean() < 0.02
    assert np.asarray(consistent)[0].mean() < 0.02  # offset view inconsistent

    # same geometry but the two views are killed by the prob filter instead
    lowconf = src_confs.copy()
    lowconf[0] = 0.1
    lowconf[1] = 0.1
    _, mask2, _, _ = gipuma_fuse(
        jnp.asarray(ref_depth), jnp.asarray(conf), jnp.asarray(src_depths),
        jnp.asarray(lowconf), jnp.asarray(ref_cam), jnp.asarray(src_cams),
        prob_threshold=0.5, disp_threshold=0.05, num_consistent=3)
    assert np.asarray(mask2).mean() < 0.02

    # with num_consistent=2 the two good views suffice again
    _, mask3, _, _ = gipuma_fuse(
        jnp.asarray(ref_depth), jnp.asarray(conf), jnp.asarray(src_depths),
        jnp.asarray(lowconf), jnp.asarray(ref_cam), jnp.asarray(src_cams),
        prob_threshold=0.5, disp_threshold=0.05, num_consistent=2)
    assert np.asarray(mask3)[8:-8, 8:-8].mean() > 0.9
