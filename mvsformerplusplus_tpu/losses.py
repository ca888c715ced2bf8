"""Multi-stage depth losses: binned cross-entropy and smooth-L1 regression.

Re-design of reference models/losses.py:19-101 in masked-weighted form (JAX
has no boolean fancy-indexing under jit; `mean over selected` becomes
`sum(x·mask)/sum(mask)`, which is exactly equivalent).

CE loss construction (reference :30-62): GT depth maps to a bin index via
half-interval bin edges; hypotheses descend in depth under inverse_depth, so
both hypotheses and logits are flipped before binning; GT outside
[min_edge, max_edge] is masked out along with invalid-depth pixels.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp

Array = jax.Array


def _masked_mean(x: Array, mask: Array) -> Array:
    m = mask.astype(jnp.float32)
    return jnp.sum(x * m) / (jnp.sum(m) + 1e-6)


def ce_depth_loss(prob_volume_pre: Array, depth_values: Array, depth_gt: Array,
                  mask: Array, inverse_depth: bool = True) -> Array:
    """Binned cross-entropy for one stage.

    prob_volume_pre: [B, D, H, W] logits; depth_values: [B, D, H, W]
    hypotheses; depth_gt / mask: [B, H, W].
    """
    logits = prob_volume_pre.astype(jnp.float32)
    dv = depth_values.astype(jnp.float32)
    gt = depth_gt.astype(jnp.float32)[:, None]  # [B,1,H,W]
    valid = mask.astype(jnp.float32) > 0.5

    ndepth = dv.shape[1]
    if inverse_depth:
        # flip only the (gradient-free) hypotheses; the LOGITS flip is
        # replaced by indexing at D-1-gt_index below — log_softmax is
        # flip-equivariant, so this is exactly equivalent, and it removes a
        # reverse op whose backward materialized a 64x tile-padded cotangent
        # ([B, D, h, w] with B minor) at large crops
        # (docs/profiles/r3_compile_cache.md OOM dump).
        dv = jnp.flip(dv, axis=1)

    intervals = jnp.abs(dv[:, 1:] - dv[:, :-1]) / 2
    intervals = jnp.concatenate([intervals, intervals[:, -1:]], axis=1)  # [B,D,H,W]
    min_edge = dv[:, :1] - intervals[:, :1]
    max_edge = dv[:, -1:] + intervals[:, -1:]
    right_edges = dv + intervals

    in_range = (gt >= min_edge) & (gt <= max_edge)  # [B,1,H,W]
    final_mask = in_range[:, 0] & valid

    gt_index = jnp.sum((right_edges <= gt).astype(jnp.int32), axis=1)  # [B,H,W]
    gt_index = jnp.clip(gt_index, 0, ndepth - 1)
    if inverse_depth:
        gt_index = ndepth - 1 - gt_index

    log_probs = jax.nn.log_softmax(logits, axis=1)
    # one-hot select (ops/sampling.select_along_d rationale): take_along_axis
    # over the non-minor D axis gathers at ~5 GB/s on TPU
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, ndepth, 1, 1), 1)
    nll = -jnp.sum(jnp.where(iota == gt_index[:, None], log_probs, 0), axis=1)
    return _masked_mean(nll, final_mask)


def smooth_l1(x: Array, y: Array) -> Array:
    d = jnp.abs(x - y)
    return jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)


def reg_depth_loss(depth_est: Array, depth_gt: Array, mask: Array,
                   depth_interval: Array, depth_values: Optional[Array] = None,
                   inverse_depth: bool = True, clip_func: Optional[str] = None,
                   log_var: Optional[Array] = None, logvar_weight: float = 0.1):
    """Interval-normalized smooth-L1 (reference models/losses.py:63-97) with
    optional dynamic clipping and log-variance uncertainty."""
    di = depth_interval[:, None, None].astype(jnp.float32)
    est = depth_est.astype(jnp.float32) / di
    gt = depth_gt.astype(jnp.float32) / di
    valid = mask.astype(jnp.float32) > 0.5

    clip_max = None
    if clip_func == "dynamic" and depth_values is not None:
        dv = depth_values.astype(jnp.float32)
        # only the range endpoints matter: index instead of flipping the
        # whole [B, D, H, W] hypothesis tensor (see ce_depth_loss note)
        lo, hi = ((dv[:, -1], dv[:, 0]) if inverse_depth
                  else (dv[:, 0], dv[:, -1]))
        clip_max = (hi - lo) / di  # [B,H,W]

    extras = {}
    if log_var is None:
        err = smooth_l1(est, gt)
        if clip_max is not None:
            err = jnp.minimum(err, clip_max)
        loss = _masked_mean(err, valid)
    else:
        l1 = jnp.abs(est - gt)
        if clip_max is not None:
            l1 = jnp.minimum(l1, clip_max)
        lv = log_var.astype(jnp.float32)
        uncert = l1 * jnp.exp(-lv) + lv * logvar_weight
        finite = jnp.isfinite(uncert) & valid
        uncert_loss = _masked_mean(jnp.where(finite, uncert, 0.0), finite)
        loss = _masked_mean(l1, valid) + uncert_loss
        extras["uncertainty"] = uncert_loss
    return loss, extras


def multi_stage_loss(
    outputs: Dict[str, dict],
    depth_gt_ms: Dict[str, Array],
    mask_ms: Dict[str, Array],
    depth_interval: Array,
    depth_types: Sequence[str] = ("ce", "ce", "ce", "ce"),
    dlossw: Sequence[float] = (1.0, 1.0, 1.0, 1.0),
    inverse_depth: bool = True,
    clip_func: Optional[str] = "dynamic",
    logvar_weight: float = 0.1,
):
    """Total weighted loss + per-stage dict (reference models/losses.py:19-101)."""
    loss_dict = {}
    total = 0.0
    for idx, dt in enumerate(depth_types):
        key = f"stage{idx + 1}"
        if key not in outputs:
            continue
        stage = outputs[key]
        if dt == "ce":
            loss = ce_depth_loss(
                stage["prob_volume_pre"], stage["depth_values"],
                depth_gt_ms[key], mask_ms[key], inverse_depth,
            )
        else:
            loss, extras = reg_depth_loss(
                stage["depth"], depth_gt_ms[key], mask_ms[key], depth_interval,
                depth_values=stage["depth_values"], inverse_depth=inverse_depth,
                clip_func=clip_func, log_var=stage.get("log_var"),
                logvar_weight=logvar_weight,
            )
            for k, v in extras.items():
                loss_dict[f"{key}_{k}"] = dlossw[idx] * v
        loss_dict[key] = dlossw[idx] * loss
        total = total + dlossw[idx] * loss
    return total, loss_dict
