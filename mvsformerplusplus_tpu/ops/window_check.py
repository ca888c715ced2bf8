"""Pre-flight warp-window validation against a scan's actual geometry.

The production warp paths share source-image windows across pixel groups
(banded bands, folded patches — ops/grid_sample.py); samples whose bilinear
corners miss the window blend to ZERO (forward) or receive ZERO gradient
(banded backward transpose). The window plans were chosen by measuring
escape fractions at the DTU protocol (tests/test_fold_window.py); any other
camera geometry must be validated the same way — the reference's warp is
unconditionally exact (reference models/warping.py:69-109), so ours must
never be silently wrong.

This module is the SHARED checker behind:
  - test.py's per-scan enforcement (auto-fallback of offending stages to
    warp_mode='folded', which has an exact forward);
  - train/trainer.py's --debug escape assert (fail loudly instead of
    training with silently-dropped gradients);
  - tools/validate_warp_windows.py (the standalone go/no-go CLI).

It resolves EXACTLY the plan StageNet will run (models/stagenet.py
resolve_warp_plan via CascadeDepth.stage_kwargs — one source of truth) and
evaluates the shipped escape diagnostics over the scan's real cams at the
cascade's scheduled hypothesis bands.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence

import numpy as np

import jax.numpy as jnp

from .geometry import compose_projection, plane_sweep_coords
from .grid_sample import banded_escape_fraction, fold_escape_fraction
from .sampling import (init_inverse_range, init_range, schedule_inverse_range,
                       schedule_range)

# the DTU epipolar-degenerate residual class: escapes at or below this are
# indistinguishable from the out-of-FOV class (tests/test_fold_window.py)
DEFAULT_THRESH = 0.003


@dataclass
class StageWindowReport:
    stage: str
    mode: str            # the resolved sampler for this stage
    fold: bool
    gy: int
    ky: int
    blocked: bool
    escape_fwd: float    # worst forward window-escape fraction over views
    escape_bwd: float    # worst banded-transpose backward escape (train)
    ok: bool

    def __str__(self):
        return (f"{self.stage}: mode={self.mode} gy={self.gy} ky={self.ky} "
                f"{'blk' if self.blocked else 'row'}"
                f"{' fold' if self.fold else ''} "
                f"fwd={self.escape_fwd:.5f} bwd={self.escape_bwd:.5f} "
                f"{'OK' if self.ok else 'ESCAPES'}")


def _bwd_window(plan, c: int, h: int, w: int):
    """(gy, ky, block_w, fold) of the banded-transpose image backward that
    banded_image_grad will run for this plan, or None when the backward is
    exact (autodiff scatter / linear transpose). Mirrors
    ops/grid_sample.py banded_image_grad + _persample_stopgrad_bwd."""
    if plan.mode == "banded":
        blocked = ((not plan.fold) and w % 128 == 0 and w >= 384
                   and h % plan.gy == 0)
        if blocked:
            return plan.gy, min(h, max(16, min(plan.ky, 24))), 128, False
        # whole-row floor for the VALIDATED StageNet path is 24
        # (_banded_stopgrad_bwd passes whole_row_ky_floor=24)
        return plan.gy, min(max(plan.ky, 24), h), 0, plan.fold
    if plan.mode == "folded" and plan.banded_bwd and c <= 16 and h % 8 == 0:
        blocked = w % 128 == 0 and w >= 384
        if blocked:
            return 8, 24, 128, False
        return 8, min(48, h), 0, False
    return None  # exact transpose of the (windowed or exact) forward


def scan_window_report(
    model,
    cams: Dict[str, np.ndarray],
    depth_values: np.ndarray,
    h: int,
    w: int,
    feat_chs: Optional[Sequence[int]] = None,
    train: bool = False,
    thresh: float = DEFAULT_THRESH,
    prev_depth_quantiles: Sequence[float] = (0.25, 0.5, 0.75),
    row_group_stride: int = 1,
    max_views: int = 0,
) -> List[StageWindowReport]:
    """Evaluate every stage's planned warp windows on a scan's cams.

    Args:
      model: CasMVSNet / DINOv2MVSNet module (any carrier of the cascade
        fields — see models/cascade.cascade_kwargs).
      cams: {'stage1'..: [B, V, 2, 4, 4]} per-stage camera stacks
        (view 0 = reference), numpy or jax.
      depth_values: [B, Dfull] the scan's hypothesis range.
      h, w: full (stage-4) image resolution.
      feat_chs: per-STAGE feature channels (stage1-first). Default derives
        from model.feat_chs reversed (the FPN decoder's output widths).
      train: also check the banded-transpose backward windows (gradients).
      prev_depth_quantiles: scheduled stages re-center on the previous
        stage's prediction, unknown pre-flight; the band is evaluated with
        the prev depth pinned at these quantiles of the hypothesis range
        (tilt drives escapes far more than the band center, but near-depth
        bands have the largest disparity gradients — 0.25 covers that).
      row_group_stride: evaluate every k-th row group only (exact per
        evaluated group; windows never couple across groups) — the cheap
        per-scan pre-flight setting (test.py uses 4).
      max_views: cap the source views checked (0 = all).

    Returns per-stage reports; report.ok is False where any view's escape
    fraction exceeds `thresh`.
    """
    from ..models.cascade import CascadeDepth, cascade_kwargs
    from ..models.stagenet import StageNet, resolve_warp_plan

    casc = CascadeDepth(**cascade_kwargs(model))
    nst = len(casc.ndepths)
    if feat_chs is None:
        feat_chs = tuple(model.feat_chs)[::-1]
    dv = jnp.asarray(depth_values, jnp.float32)

    reports: List[StageWindowReport] = []
    # stage-1 hypothesis band (full range); later stages re-centered per
    # quantile below
    for i in range(nst):
        sc = 2 ** (nst - 1 - i)
        sh, sw = h // sc, w // sc
        nd = casc.ndepths[i]
        c = int(feat_chs[i])
        st = StageNet(**casc.stage_kwargs(i))
        plan = resolve_warp_plan(st, c, sh, sw)

        # hypothesis bands to evaluate at this stage
        if i == 0:
            hypos = [init_inverse_range(dv, nd, sh, sw) if casc.inverse_depth
                     else init_range(dv, nd, sh, sw)]
        else:
            hypos = []
            ph, pw = h // (sc * 2), w // (sc * 2)
            pd = casc.ndepths[i - 1]
            prev_hypo = (init_inverse_range(dv, pd, ph, pw)
                         if casc.inverse_depth else
                         init_range(dv, pd, ph, pw))
            for q in prev_depth_quantiles:
                qi = min(pd - 1, max(0, int(round(q * (pd - 1)))))
                prev_depth = prev_hypo[:, qi]
                if casc.inverse_depth:
                    hypos.append(schedule_inverse_range(
                        prev_depth, prev_hypo, nd,
                        casc.depth_intervals_ratio[i], sh, sw))
                else:
                    itv = dv[:, 1] - dv[:, 0]
                    hypos.append(schedule_range(
                        prev_depth, nd,
                        casc.depth_intervals_ratio[i] * itv, sh, sw))

        proj = compose_projection(jnp.asarray(cams[f"stage{i + 1}"],
                                              jnp.float32))
        bwd = _bwd_window(plan, c, sh, sw) if train else None
        worst_fwd = worst_bwd = 0.0
        nv = proj.shape[1]
        views = range(1, nv if not max_views else min(nv, 1 + max_views))
        for hypo in hypos:
            for vi in views:
                coords, _ = plane_sweep_coords(proj[:, vi], proj[:, 0],
                                               hypo, sh, sw)
                coords = np.asarray(coords)
                if plan.mode == "banded":
                    cb, wb = coords, sw
                    if plan.blocked and sw % 128:
                        # banded_wpad plans: the grid pads to a 128
                        # multiple with out-of-image dummies (exactly what
                        # the compute path does)
                        wb = ((sw + 127) // 128) * 128
                        cb = np.pad(coords,
                                    ((0, 0),) * 3 + ((0, wb - sw), (0, 0)),
                                    constant_values=-1e4)
                    worst_fwd = max(worst_fwd, banded_escape_fraction(
                        cb, sh, wb, gy=plan.gy, ky=plan.ky,
                        fold=plan.fold,
                        block_w=128 if plan.blocked else 0,
                        row_group_stride=row_group_stride))
                elif plan.mode in ("pallas", "grouped"):
                    worst_fwd = max(worst_fwd, fold_escape_fraction(
                        coords, sh, sw, gy=plan.gy or 1, ky=plan.ky,
                        wx=plan.wx, fold=(plan.fold
                                          or plan.mode == "grouped"),
                        row_group_stride=row_group_stride))
                # 'folded' / 'xgrouped' forwards are exact (no shared
                # y-window beyond the full image)
                if bwd is not None:
                    bgy, bky, bblk, bfold = bwd
                    worst_bwd = max(worst_bwd, banded_escape_fraction(
                        coords, sh, sw, gy=bgy, ky=bky, fold=bfold,
                        block_w=bblk, row_group_stride=row_group_stride))
        reports.append(StageWindowReport(
            stage=f"stage{i + 1}", mode=plan.mode, fold=plan.fold,
            gy=plan.gy, ky=plan.ky, blocked=plan.blocked,
            escape_fwd=round(worst_fwd, 6), escape_bwd=round(worst_bwd, 6),
            ok=(worst_fwd <= thresh and worst_bwd <= thresh)))
    return reports


def fallback_warp_modes(model, reports: Sequence[StageWindowReport]):
    """Per-stage warp_mode list with offending stages demoted to 'folded'
    (exact forward; its backward is exact too once banded_bwd is off).
    Returns (modes, banded_bwd, changed)."""
    from ..models.cascade import CascadeDepth, cascade_kwargs

    casc = CascadeDepth(**cascade_kwargs(model))
    modes = [casc.resolved_warp_mode(i) for i in range(len(reports))]
    banded_bwd = bool(casc.banded_bwd)
    changed = False
    for i, r in enumerate(reports):
        if r.ok:
            continue
        changed = True
        if r.escape_fwd > 0 or r.mode != "folded":
            modes[i] = "folded"
        if r.escape_bwd > 0:
            # the folded path's banded backward window also escaped:
            # keep autodiff's exact scatter (model-wide knob)
            banded_bwd = False
    return modes, banded_bwd, changed
