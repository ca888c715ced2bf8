"""Loss goldens vs the reference formulas re-expressed in torch."""
import numpy as np
import torch
import torch.nn.functional as TF

from mvsformerplusplus_tpu.losses import ce_depth_loss, multi_stage_loss, reg_depth_loss


def torch_ce_loss(prob_volume_pre, depth_values, depth_gt, mask, inverse_depth=True):
    """Reference models/losses.py:30-62 as oracle."""
    prob_volume_pre = prob_volume_pre.to(torch.float32)
    mask = (mask > 0.5).to(torch.float32)
    depth_gt = depth_gt.unsqueeze(1)
    if inverse_depth:
        depth_values = torch.flip(depth_values, dims=[1])
        prob_volume_pre = torch.flip(prob_volume_pre, dims=[1])
    intervals = torch.abs(depth_values[:, 1:] - depth_values[:, :-1]) / 2
    intervals = torch.cat([intervals, intervals[:, -1:]], dim=1)
    min_dv = depth_values[:, 0:1] - intervals[:, 0:1]
    max_dv = depth_values[:, -1:] + intervals[:, -1:]
    right = depth_values + intervals
    oor = torch.clamp(
        (depth_gt < min_dv).float() + (depth_gt > max_dv).float(), 0, 1)
    final_mask = (1 - oor).squeeze(1) * mask
    gt_idx = (right <= depth_gt.expand_as(depth_values)).float().sum(dim=1, keepdims=True).long()
    gt_idx = torch.clamp_max(gt_idx, depth_values.shape[1] - 1).squeeze(1)
    fm = final_mask.bool()
    gt_sel = gt_idx[fm]
    logits = prob_volume_pre.permute(0, 2, 3, 1)[fm, :]
    return TF.cross_entropy(logits, gt_sel, reduction="mean")


def test_ce_loss_matches_reference():
    rng = np.random.RandomState(0)
    b, d, h, w = 2, 8, 6, 7
    logits = rng.randn(b, d, h, w).astype(np.float32)
    # descending hypotheses (inverse-depth convention)
    dv = np.sort(rng.uniform(2, 9, (b, d, h, w)).astype(np.float32), axis=1)[:, ::-1].copy()
    gt = rng.uniform(1.5, 9.5, (b, h, w)).astype(np.float32)
    mask = (rng.rand(b, h, w) > 0.3).astype(np.float32)

    got = float(ce_depth_loss(logits, dv, gt, mask, inverse_depth=True))
    ref = float(torch_ce_loss(
        torch.from_numpy(logits), torch.from_numpy(dv),
        torch.from_numpy(gt), torch.from_numpy(mask)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_reg_loss_matches_reference():
    rng = np.random.RandomState(1)
    b, h, w = 2, 6, 7
    est = rng.uniform(3, 8, (b, h, w)).astype(np.float32)
    gt = rng.uniform(3, 8, (b, h, w)).astype(np.float32)
    mask = (rng.rand(b, h, w) > 0.3).astype(np.float32)
    di = np.array([0.1, 0.12], np.float32)

    got, _ = reg_depth_loss(est, gt, mask, di, clip_func=None)
    t_est = torch.from_numpy(est) / torch.from_numpy(di)[:, None, None]
    t_gt = torch.from_numpy(gt) / torch.from_numpy(di)[:, None, None]
    m = torch.from_numpy(mask) > 0.5
    ref = TF.smooth_l1_loss(t_est[m], t_gt[m], reduction="mean")
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-4, atol=1e-5)


def test_multi_stage_loss_weights():
    rng = np.random.RandomState(2)
    b, d, h, w = 1, 4, 4, 4
    stage = {
        "prob_volume_pre": rng.randn(b, d, h, w).astype(np.float32),
        "depth_values": np.sort(rng.uniform(2, 9, (b, d, h, w)).astype(np.float32), axis=1)[:, ::-1].copy(),
        "depth": rng.uniform(3, 8, (b, h, w)).astype(np.float32),
    }
    outputs = {"stage1": stage}
    gt = {"stage1": rng.uniform(3, 8, (b, h, w)).astype(np.float32)}
    mask = {"stage1": np.ones((b, h, w), np.float32)}
    di = np.array([0.1], np.float32)

    t1, d1 = multi_stage_loss(outputs, gt, mask, di, depth_types=("ce",), dlossw=(1.0,))
    t2, d2 = multi_stage_loss(outputs, gt, mask, di, depth_types=("ce",), dlossw=(2.0,))
    np.testing.assert_allclose(float(t2), 2 * float(t1), rtol=1e-6)
