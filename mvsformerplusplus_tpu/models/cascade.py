"""The 4-stage coarse-to-fine cascade shared by all model families.

Factors the stage loop of the reference's top-level models
(models/networks/DINOv2_mvsformer_model.py:120-178,
models/networks/casmvs_model.py:72-131) into a reusable linen helper: depth
hypothesis scheduling per stage, optional 3D PE for transformer cost-regs,
StageNet invocation, and confidence averaging across stages.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.geometry import get_position_3d
from ..ops.resize import resize2d
from ..ops.sampling import (
    init_inverse_range,
    init_range,
    schedule_inverse_range,
    schedule_range,
)
from .stagenet import StageNet

Array = jax.Array


def cascade_kwargs(m) -> dict:
    """CascadeDepth kwargs from any model carrying the shared cascade
    fields (DINOv2MVSNet / CasMVSNet). Single construction point: used by
    the models' setup AND the pre-flight window checker
    (ops/window_check.py), so the cascade the checker reasons about is
    exactly the one the model builds."""
    return dict(
        ndepths=m.ndepths,
        depth_intervals_ratio=m.depth_intervals_ratio,
        inverse_depth=m.inverse_depth,
        cost_reg_type=m.cost_reg_type,
        depth_type=m.depth_type,
        groups=m.groups,
        use_pe3d=m.use_pe3d,
        transformer_config=m.transformer_config,
        remat_stages=m.remat_stages,
        remat_granularity=m.remat_granularity,
        shard_views=m.shard_views,
        shard_depth=m.shard_depth,
        log_var=m.log_var,
        warp_mode=m.warp_mode,
        fold_depth=m.fold_depth,
        warp_gy=m.warp_gy,
        banded_bwd=m.banded_bwd,
        dtype=m.dtype,
    )


class CascadeDepth(nn.Module):
    """Runs StageNets over per-stage features.

    Attributes mirror the reference model args (config/mvsformer++.json):
      ndepths, depth_intervals_ratio, inverse_depth, cost_reg_type (per
      stage), depth_type (per stage), groups (base_ch per stage),
      transformer_config (per transformer stage index).
    """

    ndepths: Sequence[int] = (32, 16, 8, 4)
    depth_intervals_ratio: Sequence[float] = (4.0, 2.67, 1.5, 1.0)
    inverse_depth: bool = True
    cost_reg_type: Sequence[str] = ("Normal", "Normal", "Normal", "Normal")
    depth_type: Sequence[str] = ("ce", "ce", "ce", "ce")
    groups: Sequence[int] = (8, 8, 8, 8)
    use_pe3d: bool = True
    transformer_config: Optional[Sequence[dict]] = None
    remat_stages: bool = True
    # "stage": checkpoint whole stages (replays the warp in the backward);
    # "cost_reg": checkpoint only the regularizers — the reference's own
    # granularity (models/module.py:393-396,488-492) — keeping the warp's
    # forward volume alive instead of recomputing it
    remat_granularity: str = "stage"
    shard_views: bool = False
    shard_depth: bool = False
    # "auto" = 'banded' on TPU: the banded-matmul warp
    # (ops/pallas/warp_band.py) beat the gather+blend 'pallas' path at every
    # stage of the DTU eval protocol on v5e (r3 ablation,
    # docs/profiles/r3_warp_ablation.txt: stage4 242->124 ms, stage3
    # 122->86, stage2 95->59, stage1 65->56 per build_volume).
    # A sequence gives per-stage modes — the eval CLI's window enforcement
    # uses this to fall back single offending stages to 'folded' (exact).
    warp_mode: Any = "auto"
    # Depth-folding and row-group size per stage. For the banded warp the
    # measured optimum is uniform: gy=8, NO folding (folding widens the band
    # to fold_ky=24, growing every matmul 1.5x, and band re-fetch is cheap —
    # banded+fold measured slower at every stage). The gather-based 'pallas'
    # path keeps its r2 rule: fold iff re-centered and ndepth==8, gy=16
    # under fold (stage3 138->122 ms), gy=8 otherwise. A bare bool/int
    # applies to every stage; a sequence is taken literally.
    fold_depth: Any = "auto"
    warp_gy: Any = "auto"
    # route the folded warp's image backward through the banded matmul
    # transpose (StageNet.banded_bwd); set False for datasets whose cams
    # have not passed tools/validate_warp_windows.py (window-escaping
    # samples get silently-zeroed gradients otherwise)
    banded_bwd: bool = True
    # per-stage aleatoric-uncertainty heads (see StageNet.log_var); a bare
    # bool applies to every stage
    log_var: Any = False
    dtype: Any = jnp.float32

    def _stage_warp_plan(self, i: int, nd: int, warp_mode: str):
        """Resolve (fold_depth, gy) for stage i from the auto rule or an
        explicit override."""
        if isinstance(self.fold_depth, (list, tuple)):
            fold = bool(self.fold_depth[i])
        elif self.fold_depth == "auto":
            if warp_mode == "banded":
                fold = False  # measured slower at every stage (ablation r3)
            else:
                # gather paths only fold re-centered bands with ndepth <=
                # grouped_warp_th (8); below ndepth 8 the index saving no
                # longer covers the wider patch (measured at ndepth=4)
                fold = i > 0 and nd == 8
        else:
            fold = bool(self.fold_depth)
        if isinstance(self.warp_gy, (list, tuple)):
            gy = int(self.warp_gy[i])
        elif self.warp_gy == "auto":
            gy = 16 if (fold and warp_mode != "banded") else 8
        else:
            gy = int(self.warp_gy)
        return fold, gy

    def resolved_warp_mode(self, i: int) -> str:
        """Per-stage warp mode with 'auto' resolution (sequence-aware)."""
        wm = (self.warp_mode[i]
              if isinstance(self.warp_mode, (list, tuple))
              else self.warp_mode)
        if wm == "auto":
            # 'auto': the banded-matmul warp on TPU (band DMA + exact
            # one-hot MXU matmuls, ops/pallas/warp_band.py); 'folded'
            # off-TPU where kernels would run interpreted
            wm = ("banded" if jax.default_backend() in ("tpu", "axon")
                  else "folded")
        return wm

    def stage_kwargs(self, i: int) -> dict:
        """StageNet constructor kwargs for stage i (minus remat wrapping).

        Shared by setup() and the pre-flight window checker
        (ops/window_check.py) so what gets validated is exactly what runs.
        """
        nd = self.ndepths[i]
        warp_mode = self.resolved_warp_mode(i)
        tc = None
        if self.cost_reg_type[i] == "PureTransformerCostReg" and self.transformer_config:
            tc = self.transformer_config[min(i, len(self.transformer_config) - 1)]
        return dict(
            ndepth=nd,
            groups=self.groups[i],
            cost_reg_type=self.cost_reg_type[i],
            depth_type=self.depth_type[i],
            transformer_config=tc,
            shard_views=self.shard_views,
            shard_depth=self.shard_depth,
            # bare bool: enable on every stage that SUPPORTS the
            # uncertainty head (CostRegNet3D stages, like the
            # reference's latent wire); an explicit per-stage list
            # is taken literally and StageNet raises on stages that
            # can't honor it
            log_var=(self.log_var[i]
                     if isinstance(self.log_var, (list, tuple))
                     else bool(self.log_var)
                     and self.cost_reg_type[i] != "PureTransformerCostReg"
                     and nd <= 8),
            warp_mode=warp_mode,
            banded_bwd=self.banded_bwd,
            fold_depth=self._stage_warp_plan(i, nd, warp_mode)[0],
            xgrouped_gx=self._stage_warp_plan(i, nd, warp_mode)[1],
            remat_cost_reg=(self.remat_stages
                            and self.remat_granularity != "stage"),
            # the first sweep spans the full scene range: band-
            # sharing warp paths (grouped / fold_depth) stay off
            full_range=(i == 0),
            dtype=self.dtype,
        )

    def setup(self):
        stages = []
        for i in range(len(self.ndepths)):
            cls = StageNet
            if self.remat_stages and self.remat_granularity == "stage":
                # whole-stage remat trades warp+reg FLOPs for HBM
                cls = nn.remat(StageNet, static_argnums=(4, 6))
            stages.append(cls(**self.stage_kwargs(i), name=f"stage{i + 1}"))
        self.stages = stages

    def __call__(
        self,
        features: Dict[str, Array],  # {'stage1': [B,V,H,W,C], ...}
        cams: Dict[str, Array],  # {'stage1': [B,V,2,4,4], ...}
        depth_values: Array,  # [B, Dfull]
        tmp: Sequence[float] = (5.0, 5.0, 5.0, 1.0),
        train: bool = False,
    ) -> Dict[str, Any]:
        depth_values = depth_values.astype(jnp.float32)
        depth_interval = depth_values[:, 1] - depth_values[:, 0]
        img_h = features["stage%d" % len(self.ndepths)].shape[2]
        img_w = features["stage%d" % len(self.ndepths)].shape[3]

        outputs: Dict[str, Any] = {}
        prev: Dict[str, Array] = {}
        bounds = None
        prob_maps = 0.0

        for idx in range(len(self.ndepths)):
            key = f"stage{idx + 1}"
            feats = features[key]
            stage_cams = cams[key]
            b, v, h, w, _ = feats.shape

            if idx == 0:
                if self.inverse_depth:
                    hypo = init_inverse_range(depth_values, self.ndepths[0], h, w)
                else:
                    hypo = init_range(depth_values, self.ndepths[0], h, w)
            else:
                prev_depth = jax.lax.stop_gradient(prev["depth"])
                if self.inverse_depth:
                    hypo = schedule_inverse_range(
                        prev_depth, prev["depth_values"], self.ndepths[idx],
                        self.depth_intervals_ratio[idx], h, w,
                    )
                else:
                    hypo = schedule_range(
                        prev_depth, self.ndepths[idx],
                        self.depth_intervals_ratio[idx] * depth_interval, h, w,
                    )

            position3d = None
            if self.cost_reg_type[idx] != "Normal" and self.use_pe3d:
                intr = stage_cams[:, 0, 1, :3, :3]
                position3d, bounds = get_position_3d(
                    intr, hypo, h, w,
                    depth_min=depth_values.min(), depth_max=depth_values.max(),
                    bounds=bounds,
                )

            prev = self.stages[idx](feats, stage_cams, hypo, tmp[idx], position3d, train)
            outputs[key] = prev

            conf = prev["photometric_confidence"]
            if conf.shape[1] != img_h or conf.shape[2] != img_w:
                conf = resize2d(conf[..., None], img_h, img_w, method="nearest")[..., 0]
            prob_maps = prob_maps + conf

        outputs["refined_depth"] = prev["depth"]
        outputs["photometric_confidence"] = prob_maps / len(self.ndepths)
        return outputs
