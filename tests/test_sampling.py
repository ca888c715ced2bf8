"""Depth-hypothesis scheduler goldens vs the reference formulas in torch."""
import numpy as np
import torch
import torch.nn.functional as TF

from mvsformerplusplus_tpu.ops import (
    conf_regression,
    depth_regression,
    init_range,
    schedule_inverse_range,
    schedule_range,
)


def torch_schedule_inverse_range(depth, depth_hypo, ndepths, split_itv, H, W):
    """Reference models/module.py:707-724 as test oracle."""
    last_depth_itv = 1.0 / depth_hypo[:, 2] - 1.0 / depth_hypo[:, 1]
    inverse_min_depth = 1 / depth + split_itv * last_depth_itv
    inverse_max_depth = 1 / depth - split_itv * last_depth_itv
    itv = torch.arange(0, ndepths, dtype=torch.float32).reshape(1, -1, 1, 1).repeat(
        1, 1, H // 2, W // 2
    ) / (ndepths - 1)
    inv = inverse_max_depth[:, None] + (inverse_min_depth - inverse_max_depth)[:, None] * itv
    inv = TF.interpolate(inv.unsqueeze(1), [ndepths, H, W], mode="trilinear", align_corners=True).squeeze(1)
    return 1.0 / inv


def test_schedule_inverse_range_matches():
    rng = np.random.RandomState(0)
    b, dprev, h, w = 2, 8, 6, 8
    depth = rng.uniform(3, 9, (b, h, w)).astype(np.float32)
    hypo = np.sort(rng.uniform(2, 10, (b, dprev, h, w)).astype(np.float32), axis=1)[:, ::-1].copy()
    got = np.asarray(schedule_inverse_range(depth, hypo, 16, 2.67, h * 2, w * 2))
    ref = torch_schedule_inverse_range(
        torch.from_numpy(depth), torch.from_numpy(hypo), 16, 2.67, h * 2, w * 2
    ).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_schedule_range_matches():
    rng = np.random.RandomState(1)
    b, h, w = 2, 6, 8
    cur = rng.uniform(3, 9, (b, h, w)).astype(np.float32)
    interval = np.array([0.15, 0.2], dtype=np.float32)
    ndepth = 8
    got = np.asarray(schedule_range(cur, ndepth, interval, h * 2, w * 2))

    t_cur = torch.from_numpy(cur)
    t_int = torch.from_numpy(interval)[:, None, None]
    dmin = torch.clamp_min(t_cur - ndepth / 2 * t_int, 0.001)
    dmax = t_cur + ndepth / 2 * t_int
    step = (dmax - dmin) / (ndepth - 1)
    samples = dmin.unsqueeze(1) + torch.arange(ndepth, dtype=torch.float32).reshape(1, -1, 1, 1) * step.unsqueeze(1)
    ref = TF.interpolate(samples.unsqueeze(1), [ndepth, h * 2, w * 2], mode="trilinear", align_corners=True).squeeze(1).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_init_range_uniform():
    dv = np.linspace(4.0, 10.0, 100, dtype=np.float32)[None]
    got = np.asarray(init_range(dv, 7, 2, 3))
    assert got.shape == (1, 7, 2, 3)
    np.testing.assert_allclose(got[0, :, 0, 0], np.linspace(4.0, 10.0, 7), rtol=1e-5)


def test_depth_regression():
    rng = np.random.RandomState(2)
    prob = rng.rand(2, 5, 3, 4).astype(np.float32)
    prob /= prob.sum(1, keepdims=True)
    dv = np.linspace(1, 5, 5, dtype=np.float32)[None].repeat(2, 0)
    got = np.asarray(depth_regression(prob, dv))
    ref = (prob * dv[:, :, None, None]).sum(1)
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_conf_regression_matches_reference():
    rng = np.random.RandomState(3)
    b, d, h, w = 2, 16, 5, 6
    p = rng.rand(b, d, h, w).astype(np.float32)
    p /= p.sum(1, keepdims=True)
    for n in (2, 3, 4):
        got = np.asarray(conf_regression(p, n=n))
        t = torch.from_numpy(p)
        if n % 2 == 1:
            s4 = n * TF.avg_pool3d(
                TF.pad(t.unsqueeze(1), pad=[0, 0, 0, 0, n // 2, n // 2]), (n, 1, 1), stride=1, padding=0
            ).squeeze(1)
        else:
            s4 = n * TF.avg_pool3d(
                TF.pad(t.unsqueeze(1), pad=[0, 0, 0, 0, n // 2 - 1, n // 2]), (n, 1, 1), stride=1, padding=0
            ).squeeze(1)
        idx = (t * torch.arange(d, dtype=torch.float32)[None, :, None, None]).sum(1).long().clamp(0, d - 1)
        ref = torch.gather(s4, 1, idx.unsqueeze(1)).squeeze(1).numpy()
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)
