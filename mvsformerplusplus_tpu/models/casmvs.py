"""CasMVSNet — the CNN-only cascade baseline (no ViT / FMT).

Re-design of reference models/networks/casmvs_model.py: FPN encoder/decoder
features per view + the shared 4-stage cascade. Views are folded into the
batch axis for feature extraction (always, unlike the reference which loops
views at eval to save CUDA memory — on TPU the batched form is both faster
and fine for memory since features are bf16 and the FPN is tiny).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .cascade import CascadeDepth
from .layers import FPNDecoder, FPNEncoder

Array = jax.Array


class CasMVSNet(nn.Module):
    feat_chs: Sequence[int] = (8, 16, 32, 64)
    ndepths: Sequence[int] = (32, 16, 8, 4)
    depth_intervals_ratio: Sequence[float] = (4.0, 2.67, 1.5, 1.0)
    inverse_depth: bool = True
    depth_type: Sequence[str] = ("ce", "ce", "ce", "ce")
    groups: Sequence[int] = (8, 8, 8, 8)
    cost_reg_type: Sequence[str] = ("Normal", "Normal", "Normal", "Normal")
    transformer_config: Optional[Sequence[dict]] = None
    use_pe3d: bool = False
    remat_stages: bool = True
    remat_granularity: str = "stage"
    shard_views: bool = False
    shard_depth: bool = False
    log_var: Any = False
    warp_mode: str = "auto"
    fold_depth: Any = "auto"
    warp_gy: Any = "auto"
    banded_bwd: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, imgs: Array, cams: Dict[str, Array], depth_values: Array,
                 tmp: Sequence[float] = (5.0, 5.0, 5.0, 1.0), train: bool = False):
        """imgs: [B, V, H, W, 3]; cams: {'stage1'..: [B, V, 2, 4, 4]};
        depth_values: [B, Dfull]."""
        b, v, h, w, _ = imgs.shape
        x = imgs.reshape(b * v, h, w, 3).astype(self.dtype)
        c01, c11, c21, c31 = FPNEncoder(self.feat_chs, dtype=self.dtype, name="encoder")(x, train)
        f1, f2, f3, f4 = FPNDecoder(self.feat_chs, dtype=self.dtype, name="decoder")(
            c01, c11, c21, c31, train)

        features = {
            f"stage{i + 1}": f.reshape(b, v, f.shape[1], f.shape[2], f.shape[3])
            for i, f in enumerate((f1, f2, f3, f4))
        }
        return CascadeDepth(
            ndepths=self.ndepths,
            depth_intervals_ratio=self.depth_intervals_ratio,
            inverse_depth=self.inverse_depth,
            cost_reg_type=self.cost_reg_type,
            depth_type=self.depth_type,
            groups=self.groups,
            use_pe3d=self.use_pe3d,
            transformer_config=self.transformer_config,
            remat_stages=self.remat_stages,
            remat_granularity=self.remat_granularity,
            shard_views=self.shard_views,
            shard_depth=self.shard_depth,
            log_var=self.log_var,
            warp_mode=self.warp_mode,
            fold_depth=self.fold_depth,
            warp_gy=self.warp_gy,
            banded_bwd=self.banded_bwd,
            dtype=self.dtype,
            name="cascade",
        )(features, cams, depth_values, tmp, train)
