"""Point-for-point oracle for gipuma_fuse: an independent scalar-loop numpy
transcription of the fusibile consistency algorithm as driven by the
reference (misc/gipuma.py:160-205; fusibile consumes raw mvsnet depths as
.dmb "disp" maps, so the disp_threshold is in absolute depth units).

The CUDA binary itself is not runnable here; this oracle pins the documented
semantics with per-pixel loops and plain linalg so a vectorization or
convention bug in fusion.gipuma_fuse (floor-vs-round pixel lookup, the
prob-filter-first order, the point-averaging rule) cannot hide — the same
methodology test_fusion_oracle.py applies to pcd/dpcd via the reference's
own torch code.
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from mvsformerplusplus_tpu.data.synthetic import (GeometricScene,  # noqa: E402
                                                  geometric_cameras)
from mvsformerplusplus_tpu.fusion.fusion import gipuma_fuse  # noqa: E402


def _unproject(x_px, y_px, depth, cam):
    """Pixel-center (x+0.5, y+0.5) at `depth` -> world point [3]."""
    K = cam[1, :3, :3]
    E = cam[0]
    ray = np.linalg.inv(K) @ np.array([x_px + 0.5, y_px + 0.5, 1.0])
    pt_cam = ray / ray[2] * depth
    pt_world = np.linalg.inv(E) @ np.array([*pt_cam, 1.0])
    return pt_world[:3] / pt_world[3]


def gipuma_oracle(ref_depth, ref_conf, src_depths, src_confs, ref_cam,
                  src_cams, prob_threshold, disp_threshold, num_consistent):
    """Scalar-loop transcription. Returns (points [H, W, 3], mask [H, W])."""
    v, h, w = src_depths.shape
    # probability filter FIRST (misc/gipuma.py:160-181): zeroed depths can
    # never support consistency
    src_f = np.where(src_confs > prob_threshold, src_depths, 0.0)

    points = np.zeros((h, w, 3), np.float64)
    mask = np.zeros((h, w), bool)
    for y in range(h):
        for x in range(w):
            if ref_conf[y, x] <= prob_threshold or ref_depth[y, x] <= 0:
                continue
            Xr = _unproject(x, y, ref_depth[y, x], ref_cam)
            supports = []
            for s in range(v):
                E = src_cams[s, 0]
                K = src_cams[s, 1, :3, :3]
                pc = E @ np.array([*Xr, 1.0])
                pc = pc[:3] / pc[3]
                if pc[2] <= 0:
                    continue
                uvw = K @ pc
                u, vv = uvw[0] / uvw[2], uvw[1] / uvw[2]
                # nearest-pixel lookup: pixel (i, j) covers
                # [j, j+1) x [i, i+1) in center coordinates -> floor
                xi, yi = int(np.floor(u)), int(np.floor(vv))
                if not (0 <= xi < w and 0 <= yi < h):
                    continue
                d = src_f[s, yi, xi]
                if d > 0 and abs(pc[2] - d) < disp_threshold:
                    supports.append(_unproject(xi, yi, d, src_cams[s]))
            if len(supports) >= num_consistent:
                mask[y, x] = True
                points[y, x] = (Xr + np.sum(supports, axis=0)) / (
                    len(supports) + 1)
    return points, mask


def test_gipuma_fuse_matches_scalar_oracle():
    h, w, v = 20, 28, 3
    scene = GeometricScene(3, tex_res=128)
    cams_list = geometric_cameras(v + 1, h, w, baseline=70.0)
    rng = np.random.RandomState(7)

    depths = []
    for K, E in cams_list:
        _, d = scene.render(K, E, h, w)
        depths.append(d)
    depths = np.stack(depths)  # [V+1, H, W]

    # perturb: noise at the disp-threshold scale creates both consistent and
    # inconsistent pixels; random zero-outs exercise the d>0 gates
    depths = depths + rng.uniform(-1.2, 1.2, depths.shape).astype(np.float32)
    depths[rng.rand(*depths.shape) < 0.05] = 0.0
    confs = rng.rand(v + 1, h, w).astype(np.float32)

    cam_stacks = []
    for K, E in cams_list:
        c = np.zeros((2, 4, 4), np.float32)
        c[0] = E
        c[1, :3, :3] = K
        cam_stacks.append(c)
    cam_stacks = np.stack(cam_stacks)

    kwargs = dict(prob_threshold=0.4, disp_threshold=1.0, num_consistent=2)
    pts_o, mask_o = gipuma_oracle(
        depths[0], confs[0], depths[1:], confs[1:], cam_stacks[0],
        cam_stacks[1:], **kwargs)

    fused, mask, consistent, _ = jax.jit(
        lambda *a: gipuma_fuse(*a, **kwargs))(
        jnp.asarray(depths[0]), jnp.asarray(confs[0]),
        jnp.asarray(depths[1:]), jnp.asarray(confs[1:]),
        jnp.asarray(cam_stacks[0]), jnp.asarray(cam_stacks[1:]))
    fused = np.asarray(fused, np.float64)
    mask = np.asarray(mask)

    assert mask_o.any(), "degenerate oracle: no fused pixels"
    assert (~mask_o).any(), "degenerate oracle: everything fused"
    np.testing.assert_array_equal(mask, mask_o)
    np.testing.assert_allclose(fused[mask], pts_o[mask_o], rtol=0, atol=5e-3)

    # support counts agree with the mask rule
    cnt = np.asarray(consistent).sum(0)
    ref_valid = (confs[0] > kwargs["prob_threshold"]) & (depths[0] > 0)
    np.testing.assert_array_equal(
        mask, ref_valid & (cnt >= kwargs["num_consistent"]))
