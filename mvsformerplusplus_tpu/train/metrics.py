"""Depth-map evaluation metrics (reference utils.py:126-189).

All metrics are masked means over valid GT pixels, computed per-image then
averaged over the batch (matching the reference's @compute_metrics_for_each_image
decorators). Pure jnp — usable inside jit'd eval steps and psum-reducible.

Thresholds are expressed in DTU-equivalent "mm" and scaled per sample by the
depth interval (reference trainer/mvsformer_trainer.py:293-314: BlendedMVS
scenes have arbitrary metric scale, so thresNmm uses di*N per sample; DTU
uses di/2.65*N, which is exactly N mm at the standard 2.5*1.06 interval).
"""
from __future__ import annotations

from typing import Dict, Sequence, Tuple, Union

import jax.numpy as jnp

Array = jnp.ndarray
Scale = Union[float, Array]  # scalar or per-sample [B]


def _per_image_masked_mean(value: Array, mask: Array) -> Array:
    """value/mask: [B, H, W] -> [B] per-image mean over mask (0 where empty)."""
    m = mask.astype(jnp.float32)
    s = jnp.sum(m, axis=(1, 2))
    return jnp.sum(value * m, axis=(1, 2)) / jnp.maximum(s, 1.0)


def _bhw(scale: Scale) -> Array:
    s = jnp.asarray(scale, jnp.float32)
    return s[:, None, None] if s.ndim == 1 else s


def thres_metric(depth_est: Array, depth_gt: Array, mask: Array,
                 thres: float, scale: Scale = 1.0) -> Array:
    """Fraction of valid pixels with |err| > thres*scale, batch-averaged."""
    err = jnp.abs(depth_est - depth_gt)
    viol = (err > thres * _bhw(scale)).astype(jnp.float32)
    return jnp.mean(_per_image_masked_mean(viol, mask))


def abs_depth_error(depth_est: Array, depth_gt: Array, mask: Array,
                    band: Tuple[float, float] = (0.0, 1e9),
                    scale: Scale = 1.0) -> Array:
    """Mean |err| over valid pixels with err inside scale*[lo, hi)."""
    err = jnp.abs(depth_est - depth_gt)
    s = _bhw(scale)
    m = mask.astype(bool) & (err >= band[0] * s) & (err < band[1] * s)
    return jnp.mean(_per_image_masked_mean(err, m))


def depth_metrics(depth_est: Array, depth_gt: Array, mask: Array,
                  thresholds: Sequence[float] = (2.0, 4.0, 8.0, 14.0, 20.0),
                  scale: Scale = 1.0) -> Dict[str, Array]:
    """The reference's validation metric set (trainer/mvsformer_trainer.py:
    300-336): thresNmm error rates + abs error bands + mean_error monitor.
    `scale` (scalar or per-sample [B]) converts the nominal mm thresholds to
    the sample's depth units — 1.0 for DTU-standard intervals."""
    out = {}
    for t in thresholds:
        out[f"thres{int(t)}mm_error"] = thres_metric(
            depth_est, depth_gt, mask, t, scale)
    out["abs_depth_error"] = abs_depth_error(depth_est, depth_gt, mask,
                                             scale=1.0)
    out["abs_error_0-2"] = abs_depth_error(
        depth_est, depth_gt, mask, (0.0, 2.0), scale)
    out["abs_error_2-4"] = abs_depth_error(
        depth_est, depth_gt, mask, (2.0, 4.0), scale)
    out["abs_error_4-8"] = abs_depth_error(
        depth_est, depth_gt, mask, (4.0, 8.0), scale)
    out["abs_error_8-14"] = abs_depth_error(
        depth_est, depth_gt, mask, (8.0, 14.0), scale)
    # monitor: mean of the 2/4/8/14mm error rates (reference :334-336)
    out["mean_error"] = (
        out["thres2mm_error"] + out["thres4mm_error"]
        + out["thres8mm_error"] + out["thres14mm_error"]
    ) / 4.0
    return out
