"""StageNet — one cascade stage: plane-sweep cost volume + regularization +
depth/confidence heads.

Re-design of reference models/cost_volume.py:21-133. Instead of the
reference's per-source-view Python loop, all V-1 source views are processed
as one batched tensor [B·(V-1), ...] (warp -> group correlation -> entropy ->
vis weight), then reduced with a weighted mean over the view axis — the sum
at reference models/cost_volume.py:97-101.

Distribution: the view axis is the `cv` mesh axis. When `shard_views` is set,
sharding constraints pin [B, V-1, ...] intermediates to P(None, 'cv') so the
SPMD partitioner runs each shard's views locally and lowers the final
view-sum to a psum over ICI — source-view cost-volume partitioning without
any explicit collective code.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..ops.correlation import groupwise_correlation
from ..ops.geometry import compose_projection
from ..ops.grid_sample import (
    homography_warp,
    homography_warp_banded,
    homography_warp_grouped,
    homography_warp_xgrouped,
    homography_warp_ygrouped,
)
from ..ops.sampling import (conf_regression, depth_regression,
                            select_along_d)
from .layers import MMConv
from .cost_reg import (CostRegNet, CostRegNet3D, PureTransformerCostReg,
                       _auto_layout)
from .layers import ConvBnReLU

Array = jax.Array
Dtype = Any


class VisibilityNet(nn.Module):
    """Entropy -> per-view visibility weight in (0, 1) (reference
    models/cost_volume.py:37: ConvBnReLU(1,16),(16,16),(16,8),Conv(8,1),Sigmoid)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, entropy: Array, train: bool = False) -> Array:
        x = ConvBnReLU(16, dtype=self.dtype)(entropy.astype(self.dtype), train)
        x = ConvBnReLU(16, dtype=self.dtype)(x, train)
        x = ConvBnReLU(8, dtype=self.dtype)(x, train)
        x = MMConv(1, (1, 1), dtype=self.dtype, name="Conv_0")(x)
        return nn.sigmoid(x.astype(jnp.float32))


def _constrain(x: Array, spec: Optional[P]) -> Array:
    if spec is None:
        return x
    return jax.lax.with_sharding_constraint(x, spec)


class WarpPlan(NamedTuple):
    """Resolved static warp plan for one stage at feature shape (c, h, w)."""

    mode: str        # final sampler after demotions: 'banded' | 'pallas' |
                     # 'xgrouped' | 'grouped' | 'folded'
    fold: bool       # depth-folding active (banded / pallas modes)
    gy: int          # row-group size (banded / pallas / xgrouped)
    ky: int          # band / patch-window height
    wx: int          # x patch-window width (gather modes; 0 for banded —
                     # the banded formulation has no x window)
    blocked: bool    # banded per-128-px-block path (vs whole-row bands)
    banded_bwd: bool  # 'folded' image backward routes through the banded
                      # transpose (window-limited gradients) when c <= 16


def resolve_warp_plan(st, c: int, h: int, w: int) -> WarpPlan:
    """Resolve the sampler + window plan StageNet will use for a stage.

    SINGLE SOURCE OF TRUTH for the demotion/auto-plan rules: used by
    _build_volume_impl (the compute path), the eval CLI's pre-flight
    window enforcement (test.py), the trainer's --debug escape check and
    tools/validate_warp_windows.py — so what gets validated is exactly
    what runs. `st` is anything with StageNet's warp fields (typically a
    StageNet instance; constructing one just to read attrs is pure).
    """
    mode = st.warp_mode
    if mode == "grouped" and (st.ndepth > st.grouped_warp_th
                              or st.full_range):
        mode = "folded"  # depth-grouping unsound for full-range sweeps
    fold = (st.fold_depth and not st.full_range and not st.shard_depth
            and st.ndepth <= st.grouped_warp_th and h >= st.fold_ky)
    # banded_wpad opts narrow crops (W < 384) into the BLOCKED path by
    # padding the grid/source widths (ops/grid_sample.py _banded_impl)
    blocked_w = (not fold) and (
        (w % 128 == 0 and w >= 384)
        or (getattr(st, "banded_wpad", False) and w % 8 == 0))
    banded_c_cap = (st.banded_blocked_max_c if blocked_w
                    else st.banded_max_c)
    if mode == "banded" and (c % 8 != 0 or h % st.xgrouped_gx != 0
                             or h < 2 * st.xgrouped_gx
                             or c > banded_c_cap
                             or st.shard_views or st.shard_depth):
        mode = "pallas"
    if mode == "pallas" and (c % 8 != 0 or h % st.xgrouped_gx != 0
                             or w % 128 != 0 or c > st.pallas_max_c):
        mode = "folded"
    banded_bwd = bool(getattr(st, "banded_bwd", True)
                      and not (st.shard_views or st.shard_depth))
    if mode == "banded":
        base_ky = st.banded_ky if blocked_w else max(st.banded_ky, 24)
        gy = st.xgrouped_gx
        ky = max(base_ky, st.fold_ky if fold else 2 * gy)
        if (blocked_w and not fold and c in (16, 32) and h % 2 == 0
                and gy == 8 and st.banded_ky == 16):
            # C=16/32 auto plan: gy=2 row groups shrink the block v-span
            # so ky=8 holds (escape-pinned at DTU, tests/test_fold_window)
            gy, ky = 2, 8
        return WarpPlan("banded", fold, gy, ky, 0, blocked_w, banded_bwd)
    if mode == "pallas":
        gy = st.xgrouped_gx
        ky = st.fold_ky if fold else max(st.grouped_warp_kx, 2 * gy)
        wx = st.fold_wx if fold else 6
        return WarpPlan("pallas", fold, gy, ky, wx, False, banded_bwd)
    if mode == "xgrouped":
        return WarpPlan("xgrouped", False, st.xgrouped_gx, 0,
                        st.grouped_warp_kx, False, banded_bwd)
    if mode == "grouped":
        return WarpPlan("grouped", False, 0, 2, st.grouped_warp_kx, False,
                        banded_bwd)
    return WarpPlan("folded", False, 0, 0, 0, False, banded_bwd)


class StageNet(nn.Module):
    """One coarse-to-fine stage.

    Attributes:
      ndepth: depth hypotheses at this stage.
      groups: correlation groups G (reference base_ch).
      cost_reg_type: 'PureTransformerCostReg' | 'Normal'.
      depth_type: 'ce' | 'reg'.
      transformer_config: kwargs for PureTransformerCostReg when selected.
      model_th: Normal reg uses CostRegNet3D when ndepth <= model_th
        (reference models/cost_volume.py:45-49).
      shard_views: shard the source-view axis over the `cv` mesh axis.
      shard_depth: shard the DEPTH-HYPOTHESIS axis over `cv` instead
        (SURVEY §2.3 north-star: the D axis of warp+correlation is
        embarrassingly parallel; reduction point at reference
        models/cost_volume.py:97-118). Each shard warps/correlates its
        D-slice locally; the per-view entropy softmax over D lowers to a
        distributed softmax (XLA all-reduces the max/sum), and the finished
        volume is all-gathered once before the cost regularizer. Mutually
        exclusive with shard_views.
    """

    ndepth: int
    groups: int = 8
    cost_reg_type: str = "Normal"
    depth_type: str = "ce"
    transformer_config: Optional[dict] = None
    model_th: int = 8
    shard_views: bool = False
    shard_depth: bool = False
    # warp_mode picks the plane-sweep sampler (ops/grid_sample.py):
    #   'banded': band DMA + exact one-hot MXU matmuls
    #     (ops/pallas/warp_band.py) — the production TPU path (fastest at
    #     every stage of the DTU eval ablation, r3);
    #   'pallas': y-grouped patch gather + the layout-pinned blend kernel
    #     (ops/pallas/warp_blend.py) — the r2 production path, kept as the
    #     measured fallback;
    #   'xgrouped': same gather, blend accumulated in XLA — exact but
    #     lane-padded 16x by layout assignment at stage-4 eval scale;
    #   'grouped': one patch per pixel for the whole hypothesis band — only
    #     sound for re-centered fine stages (ndepth <= grouped_warp_th, never
    #     the full-range first stage);
    #   'folded': folded-channel single gather per sample (the exact
    #     reference-semantics baseline path; the off-TPU default).
    warp_mode: str = "folded"
    grouped_warp_th: int = 8
    grouped_warp_kx: int = 16
    xgrouped_gx: int = 8
    pallas_max_c: int = 16
    # depth-folded pallas warp: one (wider) patch per pixel group serves the
    # WHOLE hypothesis band — only for re-centered fine stages (per-pixel
    # depth_values, ndepth <= grouped_warp_th) whose band footprint fits the
    # widened [fold_ky, fold_wx] window. Another D-fold fewer gather indices
    # on top of the gy grouping (gathers are index-bound on TPU).
    fold_depth: bool = True
    fold_ky: int = 24
    fold_wx: int = 12
    # banded warp band height: must cover the per-128-px-block (or whole
    # narrow row) in-image v-span. ky=16 measures ZERO escapes at every
    # blocked stage of the DTU protocol (tests/test_fold_window.py pins it)
    # and keeps the one-hot matmuls' ky*C contraction rows at <= 1 MXU
    # sublane tile for C=8 (2 for C=16): the kernel is MXU-pass-bound, so
    # ky 24 -> 16 cuts its matmul passes 2x at stage-4 scale. The whole-row
    # path (narrow W) keeps >= 24: row-wide v-spans reach ~16-18.
    banded_ky: int = 16
    # C ceiling for the banded warp. The one-hot contraction rows scale
    # with ky*C, so wide-C stages lose to the folded gather — EXCEPT on
    # the blocked fused-DMA path, where the gy=2/ky=8 auto plan keeps the
    # contraction at 2 sublane tiles for C=32: measured 35.8 ms vs folded
    # 106.1 at stage-2 DTU eval (docs/profiles/r4_banded_ablation.txt).
    # The whole-row path (narrow W, taller ky) keeps the C<=16 ceiling.
    banded_max_c: int = 16
    banded_blocked_max_c: int = 32
    # fused-DMA blocked banded warp: band slabs stream straight from the
    # source image in HBM inside the kernel (no materialized band tensor,
    # ~3x less band traffic). Production default — measured on-chip at the
    # DTU eval protocol (docs/profiles/r4_banded_ablation.txt): stage3
    # build_volume 87.5 -> 49.7 ms, stage4 77.2 -> 75.5 ms vs the gather
    # formulation. Only the BLOCKED path uses it (the whole-row/folded
    # paths keep the gather form); backward is unchanged (the banded
    # transpose is formulation-independent).
    banded_fused: bool = True
    # opt-in: route narrow-crop stages (W < 384) through the BLOCKED
    # banded path by W-padding grid and source (exact; pads are the
    # out-of-FOV class). Off by default pending per-shape measurement
    # (tools/ablate_train_warp.py rows).
    banded_wpad: bool = False
    # image backward of the 'folded' (per-sample gather) warp: True routes
    # it through the banded matmul transpose (banded_image_grad — samples
    # escaping the band window get ZERO gradient; escape-freedom is pinned
    # for DTU geometries only, tests/test_fold_window.py), False keeps
    # autodiff's exact per-sample scatter-add (~10x slower at train crops,
    # r4 profile). USER-FACING: set model.args.banded_bwd=false for any
    # dataset whose cams have not passed tools/validate_warp_windows.py.
    # Sharding (shard_views/shard_depth) force-disables it regardless.
    banded_bwd: bool = True
    # cap (bytes) on the unfolded pallas path's materialized patch temp; the
    # depth axis is lax.map-chunked to stay under it. The map's serialization
    # + per-iteration stacking costs real time (the stage-4 DTU eval while
    # loop), so callers with HBM headroom can raise it to run depth whole.
    warp_patch_budget: int = 1 << 30
    # set by the cascade for its FIRST stage: hypotheses span the full scene
    # range there, so band-sharing paths (grouped/fold) are never sound
    full_range: bool = False
    # gradient-checkpoint the cost regularizer only (see setup)
    remat_cost_reg: bool = False
    # Aleatoric-uncertainty head (reference models/module.py:454-486 has the
    # 2-channel prob conv behind CostRegNet3D(log_var=True) and
    # models/losses.py:63-97 consumes stage "log_var", but no reference
    # caller ever enables it; here the wire is closed end-to-end: config
    # arch.args.log_var -> 2-channel head -> outputs["log_var"] =
    # prob-weighted expectation of the per-hypothesis log-variance).
    log_var: bool = False
    # layout the U-Net regularizers run in ('auto' -> 'dfold' on TPU). When
    # it resolves to 'dfold', build_volume emits the volume DIRECTLY in the
    # folded [B, H, W, D*G] layout with ONE transpose — the [B, D, H, W, G]
    # intermediate's G=8 minor dim would lane-pad 16x, and the regularizer
    # would immediately re-transpose it (_to_dfold)
    reg_layout: str = "auto"
    dtype: Dtype = jnp.float32

    def _fold_handoff(self) -> bool:
        # U-Nets consume the folded layout natively (layout='dfold'); the
        # CTA regularizer's folded branch turns patchify/unpatchify into
        # reshape+einsum on compact layouts
        return _auto_layout(self.reg_layout) == "dfold"

    def setup(self):
        self.vis = VisibilityNet(dtype=self.dtype)
        if self.log_var and not (self.cost_reg_type != "PureTransformerCostReg"
                                 and self.ndepth <= self.model_th):
            # only CostRegNet3D carries the 2-channel uncertainty head
            # (reference models/module.py:454-486); silently dropping the
            # requested loss term would be worse than refusing
            raise ValueError(
                f"log_var=True requires the CostRegNet3D regularizer "
                f"(cost_reg_type 'Normal' with ndepth <= {self.model_th}); "
                f"stage has {self.cost_reg_type} ndepth={self.ndepth}")
        # remat_cost_reg: checkpoint ONLY the regularizer (the reference's
        # own granularity — models/module.py:393-396,488-492 checkpoint the
        # U-Nets, not the warp) instead of the cascade's whole-stage remat:
        # saves the banded-warp replay in the backward at the cost of
        # keeping the [B, D, H, W, G] volume alive.
        if self.cost_reg_type == "PureTransformerCostReg":
            cfg = dict(self.transformer_config or {})
            for k in ("base_channel", "attention_type", "drop", "attn_drop"):
                cfg.pop(k, None)
            if "down_rate" in cfg:
                cfg["down_rate"] = tuple(cfg["down_rate"])
            # __call__(self, x, position3d, train): train (static) is arg 3
            cls = (nn.remat(PureTransformerCostReg, static_argnums=(3, 4))
                   if self.remat_cost_reg else PureTransformerCostReg)
            self.cost_reg = cls(base_channel=self.groups, dtype=self.dtype,
                                **cfg)
        elif self.ndepth <= self.model_th:
            cls = (nn.remat(CostRegNet3D, static_argnums=(2, 3))
                   if self.remat_cost_reg else CostRegNet3D)
            self.cost_reg = cls(base_channels=self.groups,
                                log_var=self.log_var,
                                layout=self.reg_layout, dtype=self.dtype)
        else:
            cls = (nn.remat(CostRegNet, static_argnums=(2, 3))
                   if self.remat_cost_reg else CostRegNet)
            self.cost_reg = cls(base_channels=self.groups,
                                layout=self.reg_layout, dtype=self.dtype)

    def build_volume(self, features: Array, cams: Array, depth_values: Array,
                     train: bool) -> Array:
        """Weighted-mean correlation volume over source views, batched.

        features: [B, V, H, W, C] (view 0 = reference), cams: [B, V, 2, 4, 4].
        Returns [B, D, H, W, G] fp32 (external-caller convenience wrapper:
        __call__ consumes _build_volume_impl's folded layout directly).
        """
        vol, fd = self._build_volume_impl(features, cams, depth_values, train)
        if fd is None:
            return vol
        b, h, w, dg = vol.shape
        v5 = vol.reshape(b, h, w, fd, dg // fd)
        return jnp.transpose(v5, (0, 3, 1, 2, 4))

    def _build_volume_impl(self, features: Array, cams: Array,
                           depth_values: Array, train: bool):
        """Returns (volume, folded_d): folded_d=None -> [B, D, H, W, G];
        folded_d=D -> the regularizer's folded layout [B, H, W, D*G]
        (one transpose off the kernels' N-minor layout instead of two)."""
        b, v, h, w, c = features.shape
        nsrc = v - 1
        d = depth_values.shape[1]
        assert not (self.shard_views and self.shard_depth), \
            "shard_views and shard_depth both map to the cv axis"
        vspec = P(None, "cv") if self.shard_views else None
        if self.shard_depth:
            # pin the hypothesis axis to cv: the warp coords / gathers /
            # correlation all propagate this layout, so each shard builds
            # its D-slice of the volume locally
            depth_values = _constrain(depth_values, P(None, "cv"))

        ref_feat = features[:, 0].astype(jnp.float32)  # [B, H, W, C]
        src_feats = _constrain(features[:, 1:], vspec)  # [B, V-1, H, W, C]
        projs = compose_projection(cams)  # [B, V, 4, 4]
        ref_proj = projs[:, 0]
        src_projs = _constrain(projs[:, 1:], vspec)

        # src features stay in model dtype through the gather (bilinear_sample
        # gathers in input dtype and blends in f32 — the fp32 island starts at
        # the blend/correlation, reference models/cost_volume.py:64).
        # Sampler + window plan: see resolve_warp_plan for the demotion
        # rules and their measured rationale (r3/r4 ablation notes).
        plan = resolve_warp_plan(self, c, h, w)
        mode = plan.mode
        grouped = mode in ("grouped", "xgrouped", "pallas", "banded")
        sub = c // self.groups

        def warp_one(src_feat_b, src_proj_b):
            if grouped:
                # N-minor pipeline: the grouped samplers emit [B, D, C, N]
                # (N = H*W minormost keeps every buffer dense on the TPU
                # (8, 128) tile; a C-minor layout pads lanes up to 16x).
                # Correlation/entropy run in this layout; the volume is
                # transposed to conv layout [B, D, H, W, G] once, below.
                if mode == "banded":
                    # banded-matmul warp (ops/pallas/warp_band.py): full-row
                    # band DMA + exact one-hot MXU matmuls — no per-pixel
                    # gather indices at all. Window plan (fold / blocked /
                    # gy / ky) resolved by resolve_warp_plan above.
                    warped_cm, _ = homography_warp_banded(
                        src_feat_b, src_proj_b, ref_proj, depth_values,
                        gy=plan.gy, ky=plan.ky,
                        fold_depth=plan.fold,
                        band_budget=self.warp_patch_budget,
                        fused=self.banded_fused,
                        wpad=(plan.blocked
                              and not (w % 128 == 0 and w >= 384)),
                    )  # C-MAJOR [C, B, D, N] — the kernel's native layout
                    # C-major correlation: consumes the warp output with no
                    # relayout ([C, B*D*N] -> [B, D, C, N] transposes cost
                    # ~7 ms/stage on the r3b eval trace)
                    ref_cm = jnp.transpose(
                        ref_feat.reshape(b, h * w, c), (2, 0, 1))  # [C,B,N]
                    prod = warped_cm * ref_cm[:, :, None]  # [C, B, D, N]
                    corr_cm = jnp.mean(
                        prod.reshape(self.groups, sub, b, d, h * w), axis=1
                    ) if sub > 1 else prod  # [G, B, D, N]
                    sim = jax.lax.stop_gradient(
                        jnp.sum(corr_cm, axis=0))  # [B, D, N]
                    p = jax.nn.softmax(sim, axis=1)
                    entropy_flat = -jnp.sum(p * jnp.log(p + 1e-7), axis=1)
                    return corr_cm, entropy_flat
                elif mode == "pallas":
                    # fold shares one patch across the depth band (see
                    # resolve_warp_plan for the gating); unfolded windows
                    # keep ky >= 2*gy (parity-tested, tests/test_grid_sample)
                    warped_t, _ = homography_warp_ygrouped(
                        src_feat_b, src_proj_b, ref_proj, depth_values,
                        gy=plan.gy, ky=plan.ky, wx=plan.wx,
                        fold_depth=plan.fold,
                        patch_budget=self.warp_patch_budget,
                    )  # [B, D, C, N]
                elif mode == "xgrouped":
                    warped_t, _ = homography_warp_xgrouped(
                        src_feat_b, src_proj_b, ref_proj, depth_values,
                        gx=self.xgrouped_gx, kx=self.grouped_warp_kx,
                    )  # [B, D, C, N]
                else:
                    warped_t, _ = homography_warp_grouped(
                        src_feat_b, src_proj_b, ref_proj, depth_values,
                        kx=self.grouped_warp_kx,
                    )  # [B, D, C, N]
                ref_t = jnp.swapaxes(
                    ref_feat.reshape(b, h * w, c), 1, 2)  # [B, C, N]
                prod = warped_t * ref_t[:, None]
                corr_t = jnp.mean(
                    prod.reshape(b, d, self.groups, sub, h * w), axis=3
                ) if sub > 1 else prod.reshape(b, d, self.groups, h * w)
                sim = jax.lax.stop_gradient(jnp.sum(corr_t, axis=2))  # [B,D,N]
                p = jax.nn.softmax(sim, axis=1)
                entropy_flat = -jnp.sum(p * jnp.log(p + 1e-7), axis=1)
                # stay in the N-minor layout: [B, D, G, N] + [B, N]; the
                # conv-layout transpose happens ONCE on the accumulated
                # volume (a per-view transpose materializes with the small
                # G dim minor -> 16x lane padding -> OOM)
                return corr_t, entropy_flat
            warped, _ = homography_warp(
                src_feat_b, src_proj_b, ref_proj, depth_values,
                # banded matmul-transpose image backward — user-gated
                # (banded_bwd, see field docs) and force-disabled under
                # vmap/SPMD cv sharding, where the banded pallas_call is
                # unvalidated (same rule as the banded FORWARD gate)
                banded_bwd=plan.banded_bwd,
            )  # [B, D, H, W, C] f32
            # FULL-C product, NOT the G-channel correlation: the grouped
            # mean commutes with the view-weighted sum (both linear), so
            # deferring it to the final fold keeps every intermediate at
            # C=32-64 lanes instead of G=8 (16x tile padding). Same numbers
            # as groupwise_correlation -> weighted mean (reference
            # models/cost_volume.py:79-101) up to fp reassociation.
            prod_v = warped.astype(jnp.float32) * ref_feat[:, None]
            # entropy of the depth-softmax of the summed correlation
            # (stop-grad, reference models/cost_volume.py:89-93):
            # sum_g corr_g == sum_c prod_c / sub
            sim = jax.lax.stop_gradient(jnp.sum(prod_v, axis=-1) / sub)
            p = jax.nn.softmax(sim, axis=1)
            entropy_v = -jnp.sum(p * jnp.log(p + 1e-7), axis=1)[..., None]
            return prod_v, entropy_v

        src_feats_t = jnp.swapaxes(src_feats, 0, 1)  # [V-1, B, H, W, C]
        src_projs_t = jnp.swapaxes(src_projs, 0, 1)
        # Views run UNROLLED in one XLA graph (ops still pipeline — only
        # sequential lax.map serializes the gathers, measured 2.5x slower
        # end-to-end). vmap would also work for the forward, but its BATCHED
        # backward scatter (the warp transpose with views folded into the
        # scatter index space) gets a pathological layout at stage-4 scale:
        # 110 ns/update vs ~15 unrolled, 2.87 s vs 0.51 s at the DTU train
        # protocol. Under shard_views the vmapped form is kept: unrolling
        # would slice the cv-sharded view axis (an all-gather per view).
        if self.shard_views:
            corr, entropy = jax.vmap(warp_one)(src_feats_t, src_projs_t)
        else:
            pairs = [warp_one(src_feats_t[i], src_projs_t[i])
                     for i in range(nsrc)]
            corr = jnp.stack([p[0] for p in pairs])
            entropy = jnp.stack([p[1] for p in pairs])

        dspec = P(None, None, "cv") if self.shard_depth else None

        if grouped and mode == "banded":
            # C-major pipeline end-to-end: corr [V-1, G, B, D, N];
            # entropy [V-1, B, N]. No sharding constraints — banded demotes
            # under cv sharding (gate above).
            vis = self.vis(entropy.reshape(nsrc * b, h, w, 1), train)
            vis_cm = vis.reshape(nsrc, 1, b, 1, h * w)  # [V-1, 1, B, 1, N]
            volume_sum = jnp.sum(corr * vis_cm, axis=0)  # [G, B, D, N]
            vis_sum = jnp.sum(vis_cm, axis=0)            # [1, B, 1, N]
            volume_t = volume_sum / (vis_sum + 1e-6)
            # single layout transpose of the finished volume (barrier:
            # see the N-minor branch below)
            volume_t = jax.lax.optimization_barrier(volume_t)
            vol = volume_t.reshape(self.groups, b, d, h, w)
            if self._fold_handoff():
                # straight to the regularizer's folded layout: minor dim
                # D*G (32-256) instead of G=8 (16x lane padding)
                fv = jnp.transpose(vol, (1, 3, 4, 2, 0))  # [B, H, W, D, G]
                return fv.reshape(b, h, w, d * self.groups), d
            return jnp.transpose(vol, (1, 2, 3, 4, 0)), None  # [B,D,H,W,G]

        if grouped:
            # corr: [V-1, B, D, G, N]; entropy: [V-1, B, N]
            vis = self.vis(entropy.reshape(nsrc * b, h, w, 1), train)
            vis_t = vis.reshape(nsrc, b, 1, 1, h * w)  # [V-1, B, 1, 1, N]
            corr = _constrain(
                _constrain(jnp.swapaxes(corr, 0, 1), vspec), dspec)
            vis_t = _constrain(jnp.swapaxes(vis_t, 0, 1), vspec)
            volume_sum = jnp.sum(corr * vis_t, axis=1)  # [B, D, G, N]
            vis_sum = jnp.sum(vis_t, axis=1)  # [B, 1, 1, N]
            volume_t = volume_sum / (vis_sum + 1e-6)
            # single conv-layout transpose of the final volume. The barrier
            # stops the transpose's layout preference from propagating back
            # into the N-minor pipeline (without it the compiler assigns
            # lane-padded [G, N] layouts to the upstream buffers: 16x HBM).
            volume_t = jax.lax.optimization_barrier(volume_t)
            vol = volume_t.reshape(b, d, self.groups, h, w)
            if self._fold_handoff():
                fv = jnp.transpose(vol, (0, 3, 4, 1, 2))  # [B, H, W, D, G]
                fv = fv.reshape(b, h, w, d * self.groups)
                # D-sharded build: the folded minor mixes the cv-sharded D
                # axis, so the all-gather happens at this constraint
                return _constrain(
                    fv, P() if self.shard_depth else None), d
            vol = jnp.transpose(vol, (0, 1, 3, 4, 2))
            # D-sharded build: one all-gather of the finished volume before
            # the cost regularizer (the reduction/softmax point, reference
            # models/cost_volume.py:97-118)
            return _constrain(vol, P() if self.shard_depth else None), None

        # corr: [V-1, B, D, H, W, C] (full-C products); entropy: [V-1, B, H, W, 1]
        vis = self.vis(entropy.reshape(nsrc * b, h, w, 1), train)
        corr = _constrain(_constrain(
            jnp.swapaxes(corr, 0, 1), vspec), dspec)  # [B, V-1, D, H, W, C]
        vis = _constrain(
            jnp.swapaxes(vis.reshape(nsrc, b, h, w, 1), 0, 1), vspec)

        volume_sum = jnp.sum(corr * vis[:, :, None], axis=1)  # psum over cv
        vis_sum = jnp.sum(vis, axis=1)
        vol_c = volume_sum / (vis_sum[:, None] + 1e-6)  # [B, D, H, W, C]
        v6 = vol_c.reshape(b, d, h, w, self.groups, sub)
        if self._fold_handoff():
            # fold + grouped mean in one pass: the [B, D, H, W, G]
            # intermediate (G=8 minor: 16x lane padding) never materializes
            fv = jnp.transpose(v6, (0, 2, 3, 1, 4, 5)).reshape(
                b, h, w, d * self.groups, sub)
            fv = jnp.mean(fv, axis=-1) if sub > 1 else fv[..., 0]
            return _constrain(fv, P() if self.shard_depth else None), d
        vol = jnp.mean(v6, axis=-1) if sub > 1 else v6[..., 0]
        return _constrain(vol, P() if self.shard_depth else None), None

    def __call__(self, features: Array, cams: Array, depth_values: Array,
                 tmp: float = 1.0, position3d: Optional[Array] = None,
                 train: bool = False, volume_mean: Optional[Array] = None) -> dict:
        """Full stage. `volume_mean` short-circuits cost-volume construction
        (for callers that build it externally; [B, D, H, W, G] layout)."""
        folded_d = None
        if volume_mean is None:
            volume_mean, folded_d = self._build_volume_impl(
                features, cams, depth_values, train)

        if self.cost_reg_type == "PureTransformerCostReg":
            # train passed positionally: it's a remat static_argnum when
            # remat_cost_reg wraps the regularizer (kwargs can't be static)
            reg = self.cost_reg(volume_mean.astype(self.dtype), position3d,
                                train, folded_d)
        else:
            reg = self.cost_reg(volume_mean.astype(self.dtype), train,
                                folded_d)

        prob_pre = reg[..., 0].astype(jnp.float32)  # [B, D, H, W]
        prob_volume = jax.nn.softmax(prob_pre, axis=1)

        if self.depth_type == "ce":
            if train:
                idx = jnp.argmax(prob_volume, axis=1)  # [B, H, W]
                dv4 = (depth_values if depth_values.ndim == 4
                       else depth_values[:, :, None, None])
                depth = select_along_d(
                    jnp.broadcast_to(dv4, prob_volume.shape), idx)
            else:
                depth = depth_regression(
                    jax.nn.softmax(prob_pre * tmp, axis=1), depth_values
                )
            confidence = jnp.max(prob_volume, axis=1)
        else:
            depth = depth_regression(prob_volume, depth_values)
            if self.ndepth >= 32:
                confidence = conf_regression(prob_volume, n=4)
            elif self.ndepth == 16:
                confidence = conf_regression(prob_volume, n=3)
            elif self.ndepth == 8:
                confidence = conf_regression(prob_volume, n=2)
            else:
                confidence = jnp.max(prob_volume, axis=1)

        out = {
            "depth": depth,
            "prob_volume": prob_volume,
            "photometric_confidence": jax.lax.stop_gradient(confidence),
            "depth_values": depth_values,
            "prob_volume_pre": prob_pre,
        }
        if self.log_var and reg.shape[-1] == 2:
            # per-pixel log-variance: expectation of the hypothesis-wise
            # channel under the depth distribution (losses.py reg_depth_loss
            # consumes it as a [B, H, W] map)
            lv_vol = reg[..., 1].astype(jnp.float32)  # [B, D, H, W]
            out["log_var"] = jnp.sum(prob_volume * lv_vol, axis=1)
        return out
