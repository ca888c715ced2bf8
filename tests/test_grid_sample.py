"""Golden tests: bilinear gather + plane-sweep warp vs torch grid_sample and
the reference warp math re-expressed in torch."""
import numpy as np
import torch
import torch.nn.functional as TF

from mvsformerplusplus_tpu.ops import (
    bilinear_sample,
    compose_projection,
    homography_warp,
    init_inverse_range,
)


def torch_homo_warp(src_fea, src_proj, ref_proj, depth_values):
    """Reference homo_warping_3D_with_mask (models/warping.py:69-109) in torch,
    used purely as a test oracle."""
    batch, channels = src_fea.shape[0], src_fea.shape[1]
    num_depth = depth_values.shape[1]
    height, width = src_fea.shape[2], src_fea.shape[3]
    proj = torch.matmul(src_proj, torch.inverse(ref_proj))
    rot = proj[:, :3, :3]
    trans = proj[:, :3, 3:4]
    y, x = torch.meshgrid(
        [torch.arange(0, height, dtype=torch.float32), torch.arange(0, width, dtype=torch.float32)],
        indexing="ij",
    )
    y, x = y.reshape(-1), x.reshape(-1)
    xyz = torch.stack((x, y, torch.ones_like(x)))
    xyz = xyz.unsqueeze(0).repeat(batch, 1, 1)
    rot_xyz = torch.matmul(rot, xyz)
    rot_depth_xyz = rot_xyz.unsqueeze(2).repeat(1, 1, num_depth, 1) * depth_values.view(
        batch, 1, num_depth, -1
    )
    proj_xyz = rot_depth_xyz + trans.view(batch, 3, 1, 1)
    proj_xy = proj_xyz[:, :2] / (proj_xyz[:, 2:3] + 1e-6)
    proj_x_norm = proj_xy[:, 0] / ((width - 1) / 2) - 1
    proj_y_norm = proj_xy[:, 1] / ((height - 1) / 2) - 1
    grid = torch.stack((proj_x_norm, proj_y_norm), dim=3)
    x_mask = (proj_x_norm > 1) | (proj_x_norm < -1)
    y_mask = (proj_y_norm > 1) | (proj_y_norm < -1)
    mask = (x_mask | y_mask).view(batch, num_depth, height, width)
    z = proj_xyz[:, 2:3].view(batch, num_depth, height, width)
    mask = mask | (z <= 0)
    warped = TF.grid_sample(
        src_fea,
        grid.view(batch, num_depth * height, width, 2),
        mode="bilinear",
        padding_mode="zeros",
        align_corners=True,
    ).view(batch, channels, num_depth, height, width)
    return warped, mask


def rand_camera(rng, height, width, angle=0.12, tx=0.4):
    """A plausible K, E pair looking at the unit-ish scene."""
    fx = fy = 0.8 * width
    intr = np.array([[fx, 0, width / 2], [0, fy, height / 2], [0, 0, 1]], dtype=np.float32)
    c, s = np.cos(angle), np.sin(angle)
    rot = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], dtype=np.float32)
    ext = np.eye(4, dtype=np.float32)
    ext[:3, :3] = rot
    ext[:3, 3] = [tx, 0.1 * rng.randn(), 0.05 * rng.randn()]
    return intr, ext


def compose(intr, ext):
    proj = ext.copy()
    proj[:3, :4] = intr @ ext[:3, :4]
    return proj


def test_bilinear_sample_matches_grid_sample():
    rng = np.random.RandomState(0)
    b, h, w, c = 2, 13, 17, 5
    img = rng.randn(b, h, w, c).astype(np.float32)
    # coords spanning inside and (partially) outside the image
    coords = rng.uniform(-3, [w + 2, h + 2], size=(b, 40, 2)).astype(np.float32)

    got = np.asarray(bilinear_sample(img, coords))

    t_img = torch.from_numpy(np.moveaxis(img, -1, 1))
    gx = coords[..., 0] / ((w - 1) / 2) - 1
    gy = coords[..., 1] / ((h - 1) / 2) - 1
    grid = torch.from_numpy(np.stack([gx, gy], axis=-1))[:, :, None]  # [B,N,1,2]
    ref = TF.grid_sample(t_img, grid, mode="bilinear", padding_mode="zeros", align_corners=True)
    ref = ref[:, :, :, 0].permute(0, 2, 1).numpy()  # [B,N,C]
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_homography_warp_matches_reference_oracle():
    rng = np.random.RandomState(1)
    b, h, w, c, d = 1, 24, 32, 8, 16
    feat = rng.randn(b, h, w, c).astype(np.float32)

    ref_intr, ref_ext = rand_camera(rng, h, w, angle=0.0, tx=0.0)
    src_intr, src_ext = rand_camera(rng, h, w, angle=0.15, tx=0.5)
    ref_proj = compose(ref_intr, ref_ext)[None]
    src_proj = compose(src_intr, src_ext)[None]
    depth_values = np.linspace(2.0, 6.0, d, dtype=np.float32)[None].repeat(b, 0)

    warped, invalid = homography_warp(feat, src_proj, ref_proj, depth_values)
    warped = np.asarray(warped)  # [B,D,H,W,C]
    invalid = np.asarray(invalid)

    t_feat = torch.from_numpy(np.moveaxis(feat, -1, 1))
    ref_w, ref_mask = torch_homo_warp(
        t_feat, torch.from_numpy(src_proj), torch.from_numpy(ref_proj), torch.from_numpy(depth_values)
    )
    ref_w = ref_w.numpy().transpose(0, 2, 3, 4, 1)  # [B,D,H,W,C]
    np.testing.assert_allclose(warped, ref_w, rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(invalid, ref_mask.numpy())
    # sanity: a nontrivial fraction of the volume must be valid
    assert invalid.mean() < 0.9


def test_identity_warp_is_identity():
    """Same camera for src and ref -> warp must reproduce src features at
    every depth (within the valid region)."""
    rng = np.random.RandomState(2)
    b, h, w, c, d = 1, 16, 20, 4, 5
    feat = rng.randn(b, h, w, c).astype(np.float32)
    intr, ext = rand_camera(rng, h, w, angle=0.0, tx=0.0)
    proj = compose(intr, ext)[None]
    depth_values = np.linspace(1.0, 4.0, d, dtype=np.float32)[None]
    warped, invalid = homography_warp(feat, proj, proj, depth_values)
    warped = np.asarray(warped)
    assert not np.asarray(invalid).any()
    for di in range(d):
        np.testing.assert_allclose(warped[:, di], feat, rtol=1e-3, atol=1e-3)


def test_compose_projection():
    rng = np.random.RandomState(3)
    intr, ext = rand_camera(rng, 32, 40)
    cam = np.zeros((1, 2, 4, 4), dtype=np.float32)
    cam[0, 0] = ext
    cam[0, 1, :3, :3] = intr
    got = np.asarray(compose_projection(cam))[0]
    np.testing.assert_allclose(got, compose(intr, ext), rtol=1e-6, atol=1e-6)


def test_init_inverse_range_descending():
    depth_values = np.linspace(2.0, 10.0, 192, dtype=np.float32)[None]
    hypo = np.asarray(init_inverse_range(depth_values, 32, 4, 6))
    assert hypo.shape == (1, 32, 4, 6)
    np.testing.assert_allclose(hypo[0, 0, 0, 0], 10.0, rtol=1e-5)
    np.testing.assert_allclose(hypo[0, -1, 0, 0], 2.0, rtol=1e-5)
    assert (np.diff(hypo[0, :, 0, 0]) < 0).all()


def test_grouped_sample_matches_ungrouped():
    """bilinear_sample_grouped must equal the per-sample path when the group
    footprint fits the patch."""
    from mvsformerplusplus_tpu.ops.grid_sample import (
        bilinear_sample, bilinear_sample_grouped)

    rng = np.random.RandomState(4)
    b, h, w, c, g, n = 1, 24, 32, 8, 4, 50
    img = rng.randn(b, h, w, c).astype(np.float32)
    base = rng.uniform(-2, [w + 1, h + 1], size=(b, 1, n, 2)).astype(np.float32)
    # group members jitter within a few px of the base (like a fine-stage band)
    coords = base + rng.uniform(0, 6, size=(b, g, n, 2)).astype(np.float32) * [1, 0.15]

    got = np.asarray(bilinear_sample_grouped(img, coords, kx=16))  # [B,G,C,N]
    ref = np.asarray(bilinear_sample(img, coords.reshape(b, g * n, 2)))
    ref = ref.reshape(b, g, n, c).transpose(0, 1, 3, 2)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_xgrouped_warp_matches_plain_full_range():
    """x-pixel-grouped warp must equal the per-sample path on a FULL-RANGE
    sweep (the case depth-grouping cannot handle): the group's epipolar
    footprint is bounded by du/dx, not by the hypothesis band."""
    rng = np.random.RandomState(6)
    b, h, w, c, d = 1, 32, 48, 8, 16
    feat = rng.randn(b, h, w, c).astype(np.float32)
    ref_intr, ref_ext = rand_camera(rng, h, w, angle=0.0, tx=0.0)
    src_intr, src_ext = rand_camera(rng, h, w, angle=0.15, tx=0.5)
    ref_proj = compose(ref_intr, ref_ext)[None]
    src_proj = compose(src_intr, src_ext)[None]
    # full scene range — hypotheses span the whole frustum
    dv = np.linspace(2.0, 6.0, d, dtype=np.float32)[None].repeat(b, 0)

    from mvsformerplusplus_tpu.ops.grid_sample import homography_warp_xgrouped

    got, inv_g = homography_warp_xgrouped(
        feat, src_proj, ref_proj, dv, gx=8, kx=16)
    got = np.asarray(got).reshape(b, d, c, h, w).transpose(0, 1, 3, 4, 2)
    ref, inv = homography_warp(feat, src_proj, ref_proj, dv)
    np.testing.assert_allclose(got, np.asarray(ref), rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(inv_g), np.asarray(inv))


def test_xgrouped_warp_per_pixel_hypotheses():
    """Per-pixel depth maps (the cascade's scheduled bands) + a camera pair
    with roll, through the x-grouped path."""
    rng = np.random.RandomState(7)
    b, h, w, c, d = 1, 24, 40, 4, 4
    feat = rng.randn(b, h, w, c).astype(np.float32)
    ref_intr, ref_ext = rand_camera(rng, h, w, angle=0.0, tx=0.0)
    src_intr, src_ext = rand_camera(rng, h, w, angle=0.08, tx=0.3)
    # add some roll so v varies along x
    roll = 0.05
    rz = np.array([
        [np.cos(roll), -np.sin(roll), 0],
        [np.sin(roll), np.cos(roll), 0],
        [0, 0, 1]], dtype=np.float32)
    src_ext[:3, :3] = rz @ src_ext[:3, :3]
    ref_proj = compose(ref_intr, ref_ext)[None]
    src_proj = compose(src_intr, src_ext)[None]
    base = np.linspace(3.5, 4.5, d, dtype=np.float32)
    dv = np.broadcast_to(base[None, :, None, None], (b, d, h, w)).copy()
    dv = dv * rng.uniform(0.95, 1.05, size=(b, 1, h, w)).astype(np.float32)

    from mvsformerplusplus_tpu.ops.grid_sample import homography_warp_xgrouped

    got, _ = homography_warp_xgrouped(feat, src_proj, ref_proj, dv, gx=8, kx=16)
    got = np.asarray(got).reshape(b, d, c, h, w).transpose(0, 1, 3, 4, 2)
    ref, _ = homography_warp(feat, src_proj, ref_proj, dv)
    np.testing.assert_allclose(got, np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_pallas_ygrouped_matches_plain_full_range():
    """The Pallas warp path (y-grouped gather + blend kernel, interpret mode
    on CPU) must reproduce the per-sample sampler on a full-range sweep."""
    rng = np.random.RandomState(8)
    b, h, w, c, d = 1, 32, 48, 8, 6
    feat = rng.randn(b, h, w, c).astype(np.float32)
    ref_intr, ref_ext = rand_camera(rng, h, w, angle=0.0, tx=0.0)
    src_intr, src_ext = rand_camera(rng, h, w, angle=0.12, tx=0.4)
    ref_proj = compose(ref_intr, ref_ext)[None]
    src_proj = compose(src_intr, src_ext)[None]
    dv = np.linspace(2.0, 6.0, d, dtype=np.float32)[None].repeat(b, 0)

    from mvsformerplusplus_tpu.ops.grid_sample import homography_warp_ygrouped

    got, inv_g = homography_warp_ygrouped(feat, src_proj, ref_proj, dv)
    got = np.asarray(got).reshape(b, d, c, h, w).transpose(0, 1, 3, 4, 2)
    ref, inv = homography_warp(feat, src_proj, ref_proj, dv)
    np.testing.assert_allclose(got, np.asarray(ref), rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(inv_g), np.asarray(inv))


def test_pallas_ygrouped_per_pixel_hypotheses():
    """Per-pixel depth maps (the cascade's scheduled bands) + a camera pair
    with roll, through the Pallas y-grouped path."""
    rng = np.random.RandomState(7)
    b, h, w, c, d = 1, 24, 40, 4, 4
    feat = rng.randn(b, h, w, c).astype(np.float32)
    ref_intr, ref_ext = rand_camera(rng, h, w, angle=0.0, tx=0.0)
    src_intr, src_ext = rand_camera(rng, h, w, angle=0.08, tx=0.3)
    roll = 0.05
    rz = np.array([
        [np.cos(roll), -np.sin(roll), 0],
        [np.sin(roll), np.cos(roll), 0],
        [0, 0, 1]], dtype=np.float32)
    src_ext[:3, :3] = rz @ src_ext[:3, :3]
    ref_proj = compose(ref_intr, ref_ext)[None]
    src_proj = compose(src_intr, src_ext)[None]
    base = np.linspace(3.5, 4.5, d, dtype=np.float32)
    dv = np.broadcast_to(base[None, :, None, None], (b, d, h, w)).copy()
    dv = dv * rng.uniform(0.95, 1.05, size=(b, 1, h, w)).astype(np.float32)

    from mvsformerplusplus_tpu.ops.grid_sample import homography_warp_ygrouped

    got, _ = homography_warp_ygrouped(feat, src_proj, ref_proj, dv)
    got = np.asarray(got).reshape(b, d, c, h, w).transpose(0, 1, 3, 4, 2)
    ref, _ = homography_warp(feat, src_proj, ref_proj, dv)
    np.testing.assert_allclose(got, np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_pallas_ygrouped_grad_matches_plain():
    """custom-VJP of the blend kernel: gradients wrt the SOURCE FEATURES
    (through the patch-gather scatter + the backward kernel) match the
    per-sample sampler's gradients."""
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(9)
    b, h, w, c, d = 1, 16, 32, 8, 4
    feat = rng.randn(b, h, w, c).astype(np.float32)
    ref_intr, ref_ext = rand_camera(rng, h, w, angle=0.0, tx=0.0)
    src_intr, src_ext = rand_camera(rng, h, w, angle=0.1, tx=0.3)
    ref_proj = jnp.asarray(compose(ref_intr, ref_ext)[None])
    src_proj = jnp.asarray(compose(src_intr, src_ext)[None])
    dv = jnp.asarray(np.linspace(3.0, 5.0, d, dtype=np.float32)[None])
    g = jnp.asarray(rng.randn(b, d, c, h * w).astype(np.float32))

    from mvsformerplusplus_tpu.ops.grid_sample import (
        homography_warp,
        homography_warp_ygrouped,
    )

    def loss_pallas(x):
        warped, _ = homography_warp_ygrouped(x, src_proj, ref_proj, dv)
        return jnp.sum(warped * g)

    def loss_plain(x):
        warped, _ = homography_warp(x, src_proj, ref_proj, dv)
        # [B, D, H, W, C] -> [B, D, C, N]
        wt = jnp.moveaxis(warped, -1, 2).reshape(b, d, c, h * w)
        return jnp.sum(wt * g)

    gp = jax.grad(loss_pallas)(jnp.asarray(feat))
    gr = jax.grad(loss_plain)(jnp.asarray(feat))
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                               rtol=1e-4, atol=1e-4)

    # D-chunked path (lax.map over depth): same gradients
    from mvsformerplusplus_tpu.ops.grid_sample import bilinear_sample_ygrouped
    from mvsformerplusplus_tpu.ops.geometry import plane_sweep_coords

    def loss_chunked(x):
        coords, _ = plane_sweep_coords(src_proj, ref_proj, dv, h, w)
        warped = bilinear_sample_ygrouped(
            x, jax.lax.stop_gradient(coords),
            patch_budget=(h // 8) * w * 16 * 128 * 4)  # forces dc < d
        return jnp.sum(warped * g)

    gc = jax.grad(loss_chunked)(jnp.asarray(feat))
    np.testing.assert_allclose(np.asarray(gc), np.asarray(gr),
                               rtol=1e-4, atol=1e-4)

    # coord_grad=True variant (grouped transpose: blend-kernel VJP + row
    # scatter-adds instead of the per-sample linear_transpose): same grads
    def loss_diff(x):
        coords, _ = plane_sweep_coords(src_proj, ref_proj, dv, h, w)
        warped = bilinear_sample_ygrouped(
            x, jax.lax.stop_gradient(coords), coord_grad=True)
        return jnp.sum(warped * g)

    gd = jax.grad(loss_diff)(jnp.asarray(feat))
    np.testing.assert_allclose(np.asarray(gd), np.asarray(gr),
                               rtol=1e-4, atol=1e-4)


def test_grouped_warp_matches_plain():
    rng = np.random.RandomState(5)
    b, h, w, c, d = 1, 32, 40, 8, 4
    feat = rng.randn(b, h, w, c).astype(np.float32)
    ref_intr, ref_ext = rand_camera(rng, h, w, angle=0.0, tx=0.0)
    src_intr, src_ext = rand_camera(rng, h, w, angle=0.03, tx=0.1)
    ref_proj = compose(ref_intr, ref_ext)[None]
    src_proj = compose(src_intr, src_ext)[None]
    # narrow band (fine-stage-like): hypotheses within a few px of disparity
    base = np.linspace(4.0, 4.3, d, dtype=np.float32)
    dv = np.broadcast_to(base[None, :, None, None], (b, d, h, w)).copy()

    from mvsformerplusplus_tpu.ops.grid_sample import homography_warp_grouped

    got, inv_g = homography_warp_grouped(feat, src_proj, ref_proj, dv, kx=16)
    got = np.asarray(got)  # [B, D, C, H*W] N-minor layout
    got = got.reshape(b, d, c, h, w).transpose(0, 1, 3, 4, 2)
    ref, inv = homography_warp(feat, src_proj, ref_proj, dv)
    np.testing.assert_allclose(got, np.asarray(ref), rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(inv_g), np.asarray(inv))


def test_pallas_ygrouped_wide_group():
    """gy=16/ky=32: double-size row groups (half the gather indices) keep
    the same exactness envelope |dv/dy| <= (ky-2)/(gy-1) ~ 2 as the default
    gy=8/ky=16 — must stay bit-compatible with the per-sample sampler."""
    rng = np.random.RandomState(11)
    b, h, w, c, d = 1, 32, 48, 8, 4
    feat = rng.randn(b, h, w, c).astype(np.float32)
    ref_intr, ref_ext = rand_camera(rng, h, w, angle=0.0, tx=0.0)
    src_intr, src_ext = rand_camera(rng, h, w, angle=0.1, tx=0.35)
    ref_proj = compose(ref_intr, ref_ext)[None]
    src_proj = compose(src_intr, src_ext)[None]
    dv = np.linspace(2.5, 5.5, d, dtype=np.float32)[None].repeat(b, 0)

    from mvsformerplusplus_tpu.ops.grid_sample import homography_warp_ygrouped

    got, _ = homography_warp_ygrouped(
        feat, src_proj, ref_proj, dv, gy=16, ky=32, wx=8)
    got = np.asarray(got).reshape(b, d, c, h, w).transpose(0, 1, 3, 4, 2)
    ref, _ = homography_warp(feat, src_proj, ref_proj, dv)
    np.testing.assert_allclose(got, np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_pallas_ygrouped_fold_depth_matches_plain():
    """Depth-folded production path: one [ky=24, wx=12] patch per pixel
    group serves ALL D fine-stage hypotheses. Exact vs the per-sample
    sampler on a re-centered narrow band (the only regime it is enabled
    for), including gradients through the stop-grad custom VJP."""
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(13)
    b, h, w, c, d = 1, 32, 48, 8, 4
    feat = rng.randn(b, h, w, c).astype(np.float32)
    ref_intr, ref_ext = rand_camera(rng, h, w, angle=0.0, tx=0.0)
    src_intr, src_ext = rand_camera(rng, h, w, angle=0.06, tx=0.25)
    roll = 0.04
    rz = np.array([
        [np.cos(roll), -np.sin(roll), 0],
        [np.sin(roll), np.cos(roll), 0],
        [0, 0, 1]], dtype=np.float32)
    src_ext[:3, :3] = rz @ src_ext[:3, :3]
    ref_proj = compose(ref_intr, ref_ext)[None]
    src_proj = compose(src_intr, src_ext)[None]
    # narrow re-centered band: a few px of disparity across the d hypotheses
    base = np.linspace(3.9, 4.35, d, dtype=np.float32)
    dv = np.broadcast_to(base[None, :, None, None], (b, d, h, w)).copy()
    dv = dv * rng.uniform(0.97, 1.03, size=(b, 1, h, w)).astype(np.float32)

    from mvsformerplusplus_tpu.ops.grid_sample import homography_warp_ygrouped

    got, _ = homography_warp_ygrouped(
        feat, src_proj, ref_proj, dv, ky=24, wx=12, fold_depth=True)
    got = np.asarray(got).reshape(b, d, c, h, w).transpose(0, 1, 3, 4, 2)
    ref, _ = homography_warp(feat, src_proj, ref_proj, dv)
    np.testing.assert_allclose(got, np.asarray(ref), rtol=1e-4, atol=1e-4)

    # gradients (stop-grad coords): the fold forward shares the per-sample
    # backward with the unfolded path
    g = jnp.asarray(rng.randn(b, d, c, h * w).astype(np.float32))

    def loss_fold(x):
        warped, _ = homography_warp_ygrouped(
            x, jnp.asarray(src_proj), jnp.asarray(ref_proj), jnp.asarray(dv),
            ky=24, wx=12, fold_depth=True)
        return jnp.sum(warped * g)

    def loss_plain(x):
        warped, _ = homography_warp(
            x, jnp.asarray(src_proj), jnp.asarray(ref_proj), jnp.asarray(dv))
        wt = jnp.moveaxis(warped, -1, 2).reshape(b, d, c, h * w)
        return jnp.sum(wt * g)

    gf = jax.grad(loss_fold)(jnp.asarray(feat))
    gr = jax.grad(loss_plain)(jnp.asarray(feat))
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                               rtol=1e-4, atol=1e-4)


def test_pallas_ygrouped_fold_wide_group():
    """gy=16/ky=40 + depth folding: the combined variant (16*D samples per
    gather index). Exactness bound tightens to (ky-2-band)/(gy-1); ky=40
    keeps it ~2.4 for narrow bands — must match the per-sample sampler on
    DTU-like geometry."""
    rng = np.random.RandomState(17)
    b, h, w, c, d = 1, 32, 48, 8, 4
    feat = rng.randn(b, h, w, c).astype(np.float32)
    ref_intr, ref_ext = rand_camera(rng, h, w, angle=0.0, tx=0.0)
    src_intr, src_ext = rand_camera(rng, h, w, angle=0.05, tx=0.2)
    ref_proj = compose(ref_intr, ref_ext)[None]
    src_proj = compose(src_intr, src_ext)[None]
    base = np.linspace(3.9, 4.3, d, dtype=np.float32)
    dv = np.broadcast_to(base[None, :, None, None], (b, d, h, w)).copy()
    dv = dv * rng.uniform(0.98, 1.02, size=(b, 1, h, w)).astype(np.float32)

    from mvsformerplusplus_tpu.ops.grid_sample import homography_warp_ygrouped

    got, _ = homography_warp_ygrouped(
        feat, src_proj, ref_proj, dv, gy=16, ky=32, wx=12, fold_depth=True)
    got = np.asarray(got).reshape(b, d, c, h, w).transpose(0, 1, 3, 4, 2)
    ref, _ = homography_warp(feat, src_proj, ref_proj, dv)
    np.testing.assert_allclose(got, np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_banded_warp_matches_plain_full_range():
    """Banded-matmul warp (ops/pallas/warp_band.py, interpret mode): exact
    one-hot MXU selection must reproduce the per-sample sampler on a
    full-range sweep with a rolled camera (out-of-image regions -> zeros)."""
    rng = np.random.RandomState(11)
    b, h, w, c, d = 1, 32, 48, 8, 6
    feat = rng.randn(b, h, w, c).astype(np.float32)
    ref_intr, ref_ext = rand_camera(rng, h, w, angle=0.0, tx=0.0)
    src_intr, src_ext = rand_camera(rng, h, w, angle=0.12, tx=0.4)
    roll = 0.04
    rz = np.array([
        [np.cos(roll), -np.sin(roll), 0],
        [np.sin(roll), np.cos(roll), 0],
        [0, 0, 1]], dtype=np.float32)
    src_ext[:3, :3] = rz @ src_ext[:3, :3]
    ref_proj = compose(ref_intr, ref_ext)[None]
    src_proj = compose(src_intr, src_ext)[None]
    dv = np.linspace(2.0, 6.0, d, dtype=np.float32)[None].repeat(b, 0)

    from mvsformerplusplus_tpu.ops.grid_sample import homography_warp_banded

    got, _ = homography_warp_banded(feat, src_proj, ref_proj, dv, ky=16)
    # C-major contract: [C, B, D, N]
    got = np.asarray(got).reshape(c, b, d, h, w).transpose(1, 2, 3, 4, 0)
    ref, _ = homography_warp(feat, src_proj, ref_proj, dv)
    np.testing.assert_allclose(got, np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_banded_warp_fold_and_chunk_match_plain():
    """Depth-folded banded warp on re-centered per-pixel bands + the
    d-chunked path (band_budget forces lax.map) + bf16 inputs."""
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(12)
    b, h, w, c, d = 2, 24, 40, 8, 4
    feat = rng.randn(b, h, w, c).astype(np.float32)
    ref_intr, ref_ext = rand_camera(rng, h, w, angle=0.0, tx=0.0)
    src_intr, src_ext = rand_camera(rng, h, w, angle=0.08, tx=0.3)
    ref_proj = np.repeat(compose(ref_intr, ref_ext)[None], b, 0)
    src_proj = np.repeat(compose(src_intr, src_ext)[None], b, 0)
    base = np.linspace(3.6, 4.4, d, dtype=np.float32)
    dv = np.broadcast_to(base[None, :, None, None], (b, d, h, w)).copy()
    dv = dv * rng.uniform(0.96, 1.04, size=(b, 1, h, w)).astype(np.float32)

    from mvsformerplusplus_tpu.ops.grid_sample import homography_warp_banded

    ref, _ = homography_warp(feat, src_proj, ref_proj, dv)
    ref_t = np.moveaxis(np.asarray(ref), -1, 0).reshape(c, b, d, h * w)

    got, _ = homography_warp_banded(
        feat, src_proj, ref_proj, dv, ky=24, fold_depth=True)
    np.testing.assert_allclose(np.asarray(got), ref_t, rtol=1e-4, atol=1e-4)

    got, _ = homography_warp_banded(
        feat, src_proj, ref_proj, dv, ky=16, band_budget=1)
    np.testing.assert_allclose(np.asarray(got), ref_t, rtol=1e-4, atol=1e-4)

    # bf16 features: the one-hot selection is exact (0/1 in bf16), so the
    # result equals the per-sample sampler run on the same bf16 features
    fb = jnp.asarray(feat, jnp.bfloat16)
    got16, _ = homography_warp_banded(fb, src_proj, ref_proj, dv, ky=16)
    ref16, _ = homography_warp(fb, src_proj, ref_proj, dv)
    ref16_t = jnp.moveaxis(ref16, -1, 0).reshape(c, b, d, h * w)
    np.testing.assert_allclose(np.asarray(got16), np.asarray(ref16_t),
                               rtol=1e-6, atol=1e-6)


def test_banded_warp_grad_matches_plain():
    """Banded backward (transposed one-hot matmuls + ky band row
    scatter-adds) == per-sample sampler gradients, folded and unfolded."""
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(13)
    b, h, w, c, d = 1, 16, 32, 8, 4
    feat = rng.randn(b, h, w, c).astype(np.float32)
    ref_intr, ref_ext = rand_camera(rng, h, w, angle=0.0, tx=0.0)
    src_intr, src_ext = rand_camera(rng, h, w, angle=0.1, tx=0.3)
    ref_proj = jnp.asarray(compose(ref_intr, ref_ext)[None])
    src_proj = jnp.asarray(compose(src_intr, src_ext)[None])
    dv = jnp.asarray(np.linspace(3.0, 5.0, d, dtype=np.float32)[None])
    g = jnp.asarray(rng.randn(c, b, d, h * w).astype(np.float32))

    from mvsformerplusplus_tpu.ops.grid_sample import (
        homography_warp,
        homography_warp_banded,
    )

    def loss_plain(x):
        warped, _ = homography_warp(x, src_proj, ref_proj, dv)
        return jnp.sum(jnp.moveaxis(warped, -1, 0).reshape(c, b, d, h * w) * g)

    gr = jax.grad(loss_plain)(jnp.asarray(feat))

    def loss_banded(x):
        warped, _ = homography_warp_banded(x, src_proj, ref_proj, dv, ky=16)
        return jnp.sum(warped * g)

    gb = jax.grad(loss_banded)(jnp.asarray(feat))
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gr),
                               rtol=1e-4, atol=1e-4)

    # folded: per-pixel re-centered band
    base = jnp.asarray(
        np.broadcast_to(np.linspace(3.6, 4.4, d, dtype=np.float32)
                        [None, :, None, None], (b, d, h, w)).copy())

    def loss_fold(x):
        warped, _ = homography_warp_banded(
            x, src_proj, ref_proj, base, ky=16, fold_depth=True)
        return jnp.sum(warped * g)

    def loss_plain_band(x):
        warped, _ = homography_warp(x, src_proj, ref_proj, base)
        return jnp.sum(jnp.moveaxis(warped, -1, 0).reshape(c, b, d, h * w) * g)

    gf = jax.grad(loss_fold)(jnp.asarray(feat))
    grf = jax.grad(loss_plain_band)(jnp.asarray(feat))
    np.testing.assert_allclose(np.asarray(gf), np.asarray(grf),
                               rtol=1e-4, atol=1e-4)


def test_banded_blocked_path_matches_plain():
    """The production BLOCKED banded path (W % 128 == 0, per-128-px-block
    bands) under a strongly tilted camera — the geometry class where
    whole-row bands escape (in-image v spans up to 80 rows across a
    stage-4 DTU row). Includes out-of-image regions and a d-chunked run."""
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(21)
    b, h, w, c, d = 1, 64, 384, 8, 4
    feat = rng.randn(b, h, w, c).astype(np.float32)
    ref_intr, ref_ext = rand_camera(rng, h, w, angle=0.0, tx=0.0)
    src_intr, src_ext = rand_camera(rng, h, w, angle=0.15, tx=0.4)
    roll = 0.08  # tilt sized so whole-row bands escape but 128-px blocks
    # hold (whole-row v-span ~ W*roll ~ 31 rows; per-block ~ 10 + drift)
    rz = np.array([
        [np.cos(roll), -np.sin(roll), 0],
        [np.sin(roll), np.cos(roll), 0],
        [0, 0, 1]], dtype=np.float32)
    src_ext[:3, :3] = rz @ src_ext[:3, :3]
    ref_proj = compose(ref_intr, ref_ext)[None]
    src_proj = compose(src_intr, src_ext)[None]
    dv = np.linspace(2.5, 5.5, d, dtype=np.float32)[None]

    from mvsformerplusplus_tpu.ops.grid_sample import (
        banded_escape_fraction, homography_warp_banded)
    from mvsformerplusplus_tpu.ops.geometry import plane_sweep_coords

    coords, _ = plane_sweep_coords(src_proj, ref_proj, dv, h, w)
    # sanity: this geometry DOES break the whole-row window...
    assert banded_escape_fraction(
        np.asarray(coords), h, w, gy=8, ky=24, block_w=0) > 0.01
    # ...and the blocked window holds
    assert banded_escape_fraction(
        np.asarray(coords), h, w, gy=8, ky=24, block_w=128) < 1e-4

    got, _ = homography_warp_banded(feat, src_proj, ref_proj, dv, ky=24)
    got = np.asarray(got).reshape(c, b, d, h, w).transpose(1, 2, 3, 4, 0)
    ref, _ = homography_warp(feat, src_proj, ref_proj, dv)
    np.testing.assert_allclose(got, np.asarray(ref), rtol=1e-4, atol=1e-4)

    got2, _ = homography_warp_banded(feat, src_proj, ref_proj, dv, ky=24,
                                     band_budget=1)
    got2 = np.asarray(got2).reshape(c, b, d, h, w).transpose(1, 2, 3, 4, 0)
    np.testing.assert_allclose(got2, np.asarray(ref), rtol=1e-4, atol=1e-4)

    # gradients through the blocked forward (whole-row widened backward)
    g = jnp.asarray(rng.randn(c, b, d, h * w).astype(np.float32))

    def loss_b(x):
        warped, _ = homography_warp_banded(x, src_proj, ref_proj,
                                           jnp.asarray(dv), ky=24)
        return jnp.sum(warped * g)

    def loss_p(x):
        warped, _ = homography_warp(x, src_proj, ref_proj, jnp.asarray(dv))
        return jnp.sum(
            jnp.moveaxis(warped, -1, 0).reshape(c, b, d, h * w) * g)

    gb = jax.grad(loss_b)(jnp.asarray(feat))
    gp = jax.grad(loss_p)(jnp.asarray(feat))
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gp),
                               rtol=1e-4, atol=1e-4)


def test_banded_warp_grad_windowed_wide_w():
    """Wide-W banded backward: W=640 activates the bwd kernel's WINDOWED
    contraction (bu=384 < W; train-crop width class). Gradients must match
    the per-sample sampler — the window covers every in-image sample's
    columns by the same rule the forward uses."""
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(29)
    b, h, w, c, d = 1, 48, 640, 8, 2
    feat = rng.randn(b, h, w, c).astype(np.float32)
    ref_intr, ref_ext = rand_camera(rng, h, w, angle=0.0, tx=0.0)
    src_intr, src_ext = rand_camera(rng, h, w, angle=0.03, tx=0.2)
    ref_proj = jnp.asarray(compose(ref_intr, ref_ext)[None])
    src_proj = jnp.asarray(compose(src_intr, src_ext)[None])
    dv = jnp.asarray(np.linspace(3.8, 4.2, d, dtype=np.float32)[None])
    g = jnp.asarray(rng.randn(c, b, d, h * w).astype(np.float32))

    from mvsformerplusplus_tpu.ops.grid_sample import (
        homography_warp,
        homography_warp_banded,
    )

    def loss_plain(x):
        warped, _ = homography_warp(x, src_proj, ref_proj, dv)
        return jnp.sum(
            jnp.moveaxis(warped, -1, 0).reshape(c, b, d, h * w) * g)

    def loss_banded(x):
        warped, _ = homography_warp_banded(x, src_proj, ref_proj, dv, ky=16)
        return jnp.sum(warped * g)

    gr = jax.jit(jax.grad(loss_plain))(jnp.asarray(feat))
    gb = jax.jit(jax.grad(loss_banded))(jnp.asarray(feat))
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gr),
                               rtol=1e-4, atol=1e-4)


def test_banded_blocked_c16_short_band():
    """The C=16 auto plan (gy=2 row groups, ky=8 bands): one MXU sublane
    tile of one-hot matmul rows. Parity vs the per-sample sampler on
    DTU-like geometry (tests/test_fold_window.py pins zero escapes at the
    real protocol)."""
    import jax.numpy as jnp

    rng = np.random.RandomState(33)
    b, h, w, c, d = 1, 32, 384, 16, 3
    feat = rng.randn(b, h, w, c).astype(np.float32)
    ref_intr, ref_ext = rand_camera(rng, h, w, angle=0.0, tx=0.0)
    src_intr, src_ext = rand_camera(rng, h, w, angle=0.04, tx=0.15)
    ref_proj = compose(ref_intr, ref_ext)[None]
    src_proj = compose(src_intr, src_ext)[None]
    dv = np.linspace(3.6, 4.4, d, dtype=np.float32)[None]

    from mvsformerplusplus_tpu.ops.geometry import plane_sweep_coords
    from mvsformerplusplus_tpu.ops.grid_sample import (
        banded_escape_fraction, homography_warp_banded)

    coords, _ = plane_sweep_coords(src_proj, ref_proj, dv, h, w)
    assert banded_escape_fraction(
        np.asarray(coords), h, w, gy=2, ky=8, block_w=128) < 1e-6

    got, _ = homography_warp_banded(feat, src_proj, ref_proj,
                                    jnp.asarray(dv), gy=2, ky=8)
    got = np.asarray(got).reshape(c, b, d, h, w).transpose(1, 2, 3, 4, 0)
    ref, _ = homography_warp(feat, src_proj, ref_proj, dv)
    np.testing.assert_allclose(got, np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_banded_blocked_fused_matches_gather_form():
    """Fused-DMA blocked banded warp (in-kernel band DMA from HBM,
    double-buffered) == the gather-formulation blocked path == the
    per-sample sampler. Covers the d-chunked run too."""
    import jax.numpy as jnp

    rng = np.random.RandomState(41)
    b, h, w, c, d = 2, 32, 384, 8, 4
    feat = rng.randn(b, h, w, c).astype(np.float32)
    ref_intr, ref_ext = rand_camera(rng, h, w, angle=0.0, tx=0.0)
    src_intr, src_ext = rand_camera(rng, h, w, angle=0.05, tx=0.2)
    ref_proj = np.broadcast_to(compose(ref_intr, ref_ext)[None],
                               (b, 4, 4)).copy()
    src_proj = np.broadcast_to(compose(src_intr, src_ext)[None],
                               (b, 4, 4)).copy()
    dv = np.broadcast_to(
        np.linspace(3.0, 5.0, d, dtype=np.float32)[None], (b, d)).copy()

    from mvsformerplusplus_tpu.ops.grid_sample import homography_warp_banded

    ref_out, _ = homography_warp_banded(feat, src_proj, ref_proj,
                                        jnp.asarray(dv), ky=16, fused=False)
    got, _ = homography_warp_banded(feat, src_proj, ref_proj,
                                    jnp.asarray(dv), ky=16, fused=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref_out),
                               rtol=1e-5, atol=1e-5)
    # d-chunked fused run (band budget forces lax.map over depth chunks)
    got2, _ = homography_warp_banded(feat, src_proj, ref_proj,
                                     jnp.asarray(dv), ky=16, fused=True,
                                     band_budget=1)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref_out),
                               rtol=1e-5, atol=1e-5)


def test_persample_banded_bwd_matches_linear_transpose():
    """The folded warp's TPU image-backward (_persample_banded_bwd: banded
    matmul transpose of a [B,D,H,W,C] cotangent) == autodiff's
    linear_transpose of bilinear_sample, on escape-free geometry — both
    the narrow whole-row route (w=80-ish train crops) and the blocked
    route (w >= 384)."""
    import jax
    import jax.numpy as jnp

    from mvsformerplusplus_tpu.ops.geometry import plane_sweep_coords
    from mvsformerplusplus_tpu.ops.grid_sample import (
        _persample_banded_bwd, bilinear_sample)

    rng = np.random.RandomState(41)
    for h, w, c, d in ((16, 80, 8, 4), (16, 384, 8, 3)):
        feat_shape = (1, h, w, c)
        ref_intr, ref_ext = rand_camera(rng, h, w, angle=0.0, tx=0.0)
        src_intr, src_ext = rand_camera(rng, h, w, angle=0.05, tx=0.2)
        ref_proj = jnp.asarray(compose(ref_intr, ref_ext)[None])
        src_proj = jnp.asarray(compose(src_intr, src_ext)[None])
        dv = jnp.asarray(np.linspace(3.5, 4.5, d, dtype=np.float32)[None])
        coords, _ = plane_sweep_coords(src_proj, ref_proj, dv, h, w)
        ct = jnp.asarray(rng.randn(1, d, h, w, c).astype(np.float32))

        got = _persample_banded_bwd(ct, coords, feat_shape, jnp.float32)
        f = lambda im: bilinear_sample(im, coords)
        (ref,) = jax.linear_transpose(
            f, jax.ShapeDtypeStruct(feat_shape, jnp.float32))(ct)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4, err_msg=str((h, w)))


def test_banded_wpad_matches_plain():
    """W-PADDED blocked banded path (narrow crops W < 384: the train
    stage-2/3 crop class). The output grid pads to a 128 multiple with
    dummy coords and the source pads to 384 zero columns; results must be
    bit-comparable to the exact per-sample warp on the ORIGINAL grid,
    for both the gather and the fused-DMA formulations."""
    import jax.numpy as jnp

    rng = np.random.RandomState(23)
    b, h, w, c, d = 1, 64, 160, 16, 4
    feat = rng.randn(b, h, w, c).astype(np.float32)
    ref_intr, ref_ext = rand_camera(rng, h, w, angle=0.0, tx=0.0)
    src_intr, src_ext = rand_camera(rng, h, w, angle=0.12, tx=0.3)
    ref_proj = compose(ref_intr, ref_ext)[None]
    src_proj = compose(src_intr, src_ext)[None]
    dv = np.linspace(2.5, 5.5, d, dtype=np.float32)[None]

    from mvsformerplusplus_tpu.ops.grid_sample import homography_warp_banded

    ref, _ = homography_warp(feat, src_proj, ref_proj, dv)
    for fused in (False, True):
        got, _ = homography_warp_banded(feat, src_proj, ref_proj, dv,
                                        gy=2, ky=8, fused=fused, wpad=True)
        got = np.asarray(got).reshape(c, b, d, h, w).transpose(1, 2, 3, 4, 0)
        np.testing.assert_allclose(got, np.asarray(ref), rtol=1e-4,
                                   atol=1e-4, err_msg=f"fused={fused}")
