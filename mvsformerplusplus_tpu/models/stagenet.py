"""StageNet — one cascade stage: plane-sweep cost volume + regularization +
depth/confidence heads.

Re-design of reference models/cost_volume.py:21-133. The per-source-view
work (warp -> group correlation -> entropy -> vis weight -> accumulate) is
factored into `view_contribution` so the distributed path
(parallel/cost_volume.py) can run the same function per-shard and psum the
two accumulators over the `cv` mesh axis — the sum at reference
models/cost_volume.py:97-101 is exactly that reduction.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.correlation import correlation_entropy, groupwise_correlation
from ..ops.geometry import compose_projection
from ..ops.grid_sample import homography_warp
from ..ops.sampling import conf_regression, depth_regression
from .cost_reg import CostRegNet, CostRegNet3D, PureTransformerCostReg
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
        x = nn.Conv(1, (1, 1), dtype=self.dtype)(x)
        return nn.sigmoid(x.astype(jnp.float32))


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
    """

    ndepth: int
    groups: int = 8
    cost_reg_type: str = "Normal"
    depth_type: str = "ce"
    transformer_config: Optional[dict] = None
    model_th: int = 8
    dtype: Dtype = jnp.float32

    def setup(self):
        self.vis = VisibilityNet(dtype=self.dtype)
        if self.cost_reg_type == "PureTransformerCostReg":
            cfg = dict(self.transformer_config or {})
            cfg.pop("base_channel", None)
            cfg.pop("attention_type", None)
            cfg.pop("drop", None)
            cfg.pop("attn_drop", None)
            if "down_rate" in cfg:
                cfg["down_rate"] = tuple(cfg["down_rate"])
            self.cost_reg = PureTransformerCostReg(
                base_channel=self.groups, dtype=self.dtype, **cfg
            )
        elif self.ndepth <= self.model_th:
            self.cost_reg = CostRegNet3D(base_channels=self.groups, dtype=self.dtype)
        else:
            self.cost_reg = CostRegNet(base_channels=self.groups, dtype=self.dtype)

    def view_contribution(self, ref_feat: Array, src_feat: Array,
                          ref_proj: Array, src_proj: Array,
                          depth_values: Array, train: bool) -> Tuple[Array, Array]:
        """corr [B,D,H,W,G] (vis-weighted) and vis [B,H,W,1] for one src view."""
        warped, _ = homography_warp(
            src_feat.astype(jnp.float32), src_proj, ref_proj, depth_values
        )
        corr = groupwise_correlation(warped, ref_feat, self.groups)
        entropy = correlation_entropy(corr)
        vis = self.vis(entropy, train)  # [B,H,W,1]
        return corr * vis[:, None], vis

    def build_volume(self, features: Array, cams: Array, depth_values: Array,
                     train: bool) -> Array:
        """Weighted-mean correlation volume over source views.

        features: [B, V, H, W, C] (view 0 = reference), cams: [B, V, 2, 4, 4].
        """
        nviews = features.shape[1]
        ref_feat = features[:, 0].astype(jnp.float32)
        projs = compose_projection(cams)  # [B, V, 4, 4]
        volume_sum = 0.0
        vis_sum = 0.0
        for v in range(1, nviews):
            corr_w, vis = self.view_contribution(
                ref_feat, features[:, v], projs[:, 0], projs[:, v], depth_values, train
            )
            volume_sum = volume_sum + corr_w
            vis_sum = vis_sum + vis
        return volume_sum / (vis_sum[:, None] + 1e-6)

    def __call__(self, features: Array, cams: Array, depth_values: Array,
                 tmp: float = 1.0, position3d: Optional[Array] = None,
                 train: bool = False, volume_mean: Optional[Array] = None) -> dict:
        """Full stage. `volume_mean` short-circuits cost-volume construction
        (used by the view-sharded distributed path which builds it with psum).
        """
        if volume_mean is None:
            volume_mean = self.build_volume(features, cams, depth_values, train)

        if self.cost_reg_type == "PureTransformerCostReg":
            reg = self.cost_reg(volume_mean.astype(self.dtype), position3d, train=train)
        else:
            reg = self.cost_reg(volume_mean.astype(self.dtype), train=train)

        prob_pre = reg[..., 0].astype(jnp.float32)  # [B, D, H, W]
        prob_volume = jax.nn.softmax(prob_pre, axis=1)

        if self.depth_type == "ce":
            if train:
                idx = jnp.argmax(prob_volume, axis=1)  # [B, H, W]
                depth = jnp.take_along_axis(depth_values, idx[:, None], axis=1)[:, 0]
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

        return {
            "depth": depth,
            "prob_volume": prob_volume,
            "photometric_confidence": jax.lax.stop_gradient(confidence),
            "depth_values": depth_values,
            "prob_volume_pre": prob_pre,
        }
