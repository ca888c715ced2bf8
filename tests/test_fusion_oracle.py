"""Fusion parity vs the REFERENCE torch filters run as a CPU oracle.

The reference's pcd/dpcd drivers (test.py:387-442 / :445-517 on top of
misc/fusion.py) are executed directly (with .cuda() patched to a no-op) on a
synthetic multi-view scene with realistic noise, and our JAX pcd_fuse /
dpcd_fuse must agree point-for-point: mask IoU and fused-depth error.
Nothing from the reference is imported into the framework itself.
"""
import sys

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from mvsformerplusplus_tpu.data.io import build_camera_stack
from mvsformerplusplus_tpu.fusion.fusion import dpcd_fuse, pcd_fuse

sys.path.insert(0, "/root/reference")


@pytest.fixture(scope="module")
def ref_fusion():
    # misc/fusion.py hard-codes .cuda() in get_pixel_grids; run it on CPU
    orig = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    from misc import fusion as torch_fusion
    yield torch_fusion
    torch.Tensor.cuda = orig


def make_cam(angle, tx, h, w, f=80.0):
    c, s = np.cos(angle), np.sin(angle)
    ext = np.eye(4, dtype=np.float32)
    ext[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
    ext[0, 3] = tx
    intr = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], np.float32)
    return build_camera_stack(intr, ext)


def make_scene(h=48, w=64, v=4, seed=0):
    """Tilted world plane + smooth per-view depth noise + random confidences:
    enough structure that the filters genuinely discriminate (some pixels
    pass, some fail) instead of the degenerate all-pass/all-fail cases."""
    rng = np.random.RandomState(seed)
    ref_cam = make_cam(0.0, 0.0, h, w)
    src_cams = np.stack(
        [make_cam(0.005 * (i + 1), 0.07 * (i + 1), h, w) for i in range(v)])
    normal = np.array([0.15, -0.1, 1.0], np.float32)
    normal /= np.linalg.norm(normal)
    plane_d = 5.0

    def render(cam):
        E, K = cam[0], cam[1, :3, :3]
        Kinv, Einv = np.linalg.inv(K), np.linalg.inv(E)
        y, x = np.mgrid[0:h, 0:w].astype(np.float32)
        pix = np.stack([x + 0.5, y + 0.5, np.ones_like(x)], axis=-1)
        rays_world = (pix @ Kinv.T) @ Einv[:3, :3].T
        origin = Einv[:3, 3]
        t = (plane_d - origin @ normal) / (rays_world @ normal)
        return t.astype(np.float32)

    ref_depth = render(ref_cam)
    src_depths = np.stack([render(c) for c in src_cams])
    # smooth multiplicative noise: ~half the pixels stay within the
    # consistency thresholds, half drift out
    for i in range(v):
        g = rng.randn(h // 8, w // 8).astype(np.float32)
        g = np.kron(g, np.ones((8, 8), np.float32))
        src_depths[i] *= 1.0 + 0.004 * g
    ref_conf = rng.uniform(0.2, 1.0, (h, w)).astype(np.float32)
    src_confs = rng.uniform(0.2, 1.0, (v, h, w)).astype(np.float32)
    return ref_depth, ref_conf, src_depths, src_confs, ref_cam, src_cams


def _iou(a, b):
    return (a & b).sum() / max((a | b).sum(), 1)


def test_pcd_matches_reference_driver(ref_fusion):
    """Our pcd_fuse vs the exact reference filter_depth chain
    (test.py:397-409)."""
    ref_depth, ref_conf, src_depths, src_confs, ref_cam, src_cams = make_scene()
    conf_thresh, thres_disp, thres_view = 0.5, 1.0, 3

    t = lambda x: torch.from_numpy(np.asarray(x))
    rd = t(ref_depth)[None, None]            # n1hw
    sd = t(src_depths)[None, :, None]        # nv1hw
    rc = t(ref_cam)[None]
    sc = t(src_cams)[None]
    sd = sd * (t(src_confs)[None, :, None] > conf_thresh).float()
    prob_mask = t(ref_conf)[None, None] > conf_thresh

    reproj_xyd, in_range = ref_fusion.get_reproj(rd, sd, rc, sc)
    vis_masks, vis_mask = ref_fusion.vis_filter(
        rd, reproj_xyd, in_range, thres_disp, 0.01, thres_view)
    ref_ave = ref_fusion.ave_fusion(rd, reproj_xyd, vis_masks)
    oracle_mask = ref_fusion.bin_op_reduce([prob_mask, vis_mask], torch.min)
    idx_img = ref_fusion.get_pixel_grids(*ref_ave.size()[-2:]).unsqueeze(0)
    idx_cam = ref_fusion.idx_img2cam(idx_img, ref_ave, rc)
    oracle_pts = ref_fusion.idx_cam2world(idx_cam, rc)[..., :3, 0]

    pts, mask = pcd_fuse(
        jnp.asarray(ref_depth), jnp.asarray(ref_conf), jnp.asarray(src_depths),
        jnp.asarray(src_confs), jnp.asarray(ref_cam), jnp.asarray(src_cams),
        conf_thresh=conf_thresh, img_dist_thresh=thres_disp,
        depth_thresh=0.01, vthresh=thres_view)

    om = oracle_mask[0, 0].numpy()
    m = np.asarray(mask)
    assert om.mean() > 0.05 and om.mean() < 0.95, "oracle mask degenerate"
    assert _iou(m, om) > 0.99, f"mask IoU {_iou(m, om):.4f}"
    both = m & om
    err = np.abs(np.asarray(pts)[both] - oracle_pts[0].numpy()[both])
    assert err.max() < 1e-3, f"fused point error {err.max():.2e}"


def test_dpcd_matches_reference_driver(ref_fusion):
    """Our dpcd_fuse vs the exact reference dynamic_filter_depth chain
    (test.py:458-482)."""
    ref_depth, ref_conf, src_depths, src_confs, ref_cam, src_cams = make_scene(seed=1)
    conf_thresh, dist_base, rel_diff_base = 0.5, 4.0, 1300.0
    v = src_depths.shape[0]
    dy_range = v + 1

    t = lambda x: torch.from_numpy(np.asarray(x))
    rd = t(ref_depth)[None, None]
    sd = t(src_depths)[None, :, None]
    rc = t(ref_cam)[None]
    sc = t(src_cams)[None]
    prob_mask = t(ref_conf)[None, None] > conf_thresh

    reproj_xyd = ref_fusion.get_reproj_dynamic(rd, sd, rc, sc)
    vis_masks, vis_mask = ref_fusion.vis_filter_dynamic(
        rd, reproj_xyd, dist_base=dist_base, rel_diff_base=rel_diff_base)
    reproj_depth = reproj_xyd[:, :, -1]
    reproj_depth[~vis_mask.squeeze(2)] = 0
    geo_mask_sums = vis_masks.sum(dim=1)
    geo_mask_sum = vis_mask.sum(dim=1)
    ref_ave = (torch.sum(reproj_depth, dim=1, keepdim=True) + rd) / (geo_mask_sum + 1)
    geo_mask = geo_mask_sum >= dy_range
    for i in range(2, dy_range):
        geo_mask = torch.logical_or(geo_mask, geo_mask_sums[:, i - 2] >= i)
    oracle_mask = ref_fusion.bin_op_reduce([prob_mask, geo_mask], torch.min)
    idx_img = ref_fusion.get_pixel_grids(*ref_ave.size()[-2:]).unsqueeze(0)
    idx_cam = ref_fusion.idx_img2cam(idx_img, ref_ave, rc)
    oracle_pts = ref_fusion.idx_cam2world(idx_cam, rc)[..., :3, 0]

    pts, mask = dpcd_fuse(
        jnp.asarray(ref_depth), jnp.asarray(ref_conf), jnp.asarray(src_depths),
        jnp.asarray(ref_cam), jnp.asarray(src_cams), conf_thresh=conf_thresh,
        dist_base=dist_base, rel_diff_base=rel_diff_base)

    om = oracle_mask[0, 0].numpy()
    m = np.asarray(mask)
    assert om.mean() > 0.05 and om.mean() < 0.95, "oracle mask degenerate"
    assert _iou(m, om) > 0.99, f"mask IoU {_iou(m, om):.4f}"
    both = m & om
    err = np.abs(np.asarray(pts)[both] - oracle_pts[0].numpy()[both])
    assert err.max() < 1e-3, f"fused point error {err.max():.2e}"
