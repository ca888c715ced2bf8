"""DINOv2MVSNet — the flagship model: frozen DINOv2 features + SVA cross-view
decoder + FPN + FMT + 4-stage cascade.

Re-design of reference models/networks/DINOv2_mvsformer_model.py. Views are
folded into batch for all per-view compute; the eval-time view loop the
reference uses to save CUDA memory is unnecessary on TPU (bf16 activations +
rematerialized stages).

Image -> ViT input resize is bicubic align_corners=False at scale
`rescale=0.4375` rounded to the patch grid (reference :72-76); with H, W
divisible by 64 the ViT grid ×4 lands exactly on the 1/8-res FPN stage.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.resize import resize2d
from .cascade import CascadeDepth, cascade_kwargs
from .cross_vit import CrossVITDecoder
from .dino import DinoVisionTransformer
from .fmt import FMTWithPathway
from .layers import FPNDecoder, FPNEncoder

Array = jax.Array


class DINOv2MVSNet(nn.Module):
    # feature pyramid
    feat_chs: Sequence[int] = (8, 16, 32, 64)
    # ViT
    rescale: float = 0.4375
    vit_ch: int = 768
    out_ch: int = 64
    freeze_vit: bool = True
    vit_patch: int = 14
    vit_depth: int = 12
    vit_num_heads: int = 12
    cross_interval_layers: int = 3
    decoder_cfg: Optional[dict] = None
    fmt_config: Optional[dict] = None
    # cascade
    ndepths: Sequence[int] = (32, 16, 8, 4)
    depth_intervals_ratio: Sequence[float] = (4.0, 2.67, 1.5, 1.0)
    inverse_depth: bool = True
    depth_type: Sequence[str] = ("ce", "ce", "ce", "ce")
    groups: Sequence[int] = (8, 8, 8, 8)
    cost_reg_type: Sequence[str] = ("PureTransformerCostReg", "Normal", "Normal", "Normal")
    transformer_config: Optional[Sequence[dict]] = None
    use_pe3d: bool = True
    remat_stages: bool = True
    remat_granularity: str = "stage"
    shard_views: bool = False
    shard_depth: bool = False
    log_var: Any = False
    warp_mode: Any = "auto"  # str, or a per-stage sequence
    fold_depth: Any = "auto"
    warp_gy: Any = "auto"
    banded_bwd: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        self.encoder = FPNEncoder(self.feat_chs, dtype=self.dtype, name="encoder")
        self.decoder = FPNDecoder(self.feat_chs, dtype=self.dtype, name="decoder")
        self.vit = DinoVisionTransformer(
            embed_dim=self.vit_ch, patch_size=self.vit_patch,
            depth=self.vit_depth, num_heads=self.vit_num_heads,
            cross_interval_layers=self.cross_interval_layers,
            dtype=self.dtype, name="vit",
        )
        dec = dict(self.decoder_cfg or {})
        variant = {"Linear": "linear", "FLASH2": "softmax", "XFormers": "softmax"}.get(
            dec.get("attention_type", "Linear"), "linear")
        self.decoder_vit = CrossVITDecoder(
            d_model=dec.get("d_model", self.vit_ch),
            nhead=dec.get("nhead", 12),
            cross_interval_layers=self.cross_interval_layers,
            variant=variant,
            ffn_type=dec.get("ffn_type", "ffn"),
            init_values=dec.get("init_values", 1.0),
            prev_values=dec.get("prev_values", 0.5),
            softmax_scale=dec.get("softmax_scale", "entropy_invariance"),
            train_avg_length=dec.get("train_avg_length", 762),
            post_norm=dec.get("post_norm", False),
            pre_norm_query=dec.get("pre_norm_query", True),
            no_combine_norm=dec.get("no_combine_norm", False),
            out_ch=self.out_ch,
            dtype=self.dtype,
            name="decoder_vit",
        )
        self.fmt = FMTWithPathway(
            base_channel=self.groups[0],
            fmt_config=self.fmt_config,
            dtype=self.dtype,
            name="fmt",
        )
        self.cascade = CascadeDepth(**cascade_kwargs(self), name="cascade")

    def vit_features(self, imgs_flat: Array, b: int, v: int, train: bool) -> Array:
        """imgs_flat: [B·V, H, W, 3] full-res -> [B, V, H/8, W/8, out_ch]."""
        bh, h, w, _ = imgs_flat.shape
        p = self.vit_patch
        vit_h = int(h * self.rescale // p * p)
        vit_w = int(w * self.rescale // p * p)
        vit_imgs = resize2d(imgs_flat, vit_h, vit_w, method="cubic", align_corners=False)

        levels = self.vit(vit_imgs)
        if self.freeze_vit:
            levels = [jax.lax.stop_gradient(f) for f in levels]
        levels = [f.reshape(b, v, -1, self.vit_ch) for f in levels]
        vit_shape = (b, v, vit_h // p, vit_w // p, self.vit_ch)
        return self.decoder_vit(levels, vit_shape, train=train)

    def __call__(self, imgs: Array, cams: Dict[str, Array], depth_values: Array,
                 tmp: Sequence[float] = (5.0, 5.0, 5.0, 1.0), train: bool = False):
        """imgs: [B, V, H, W, 3]; cams: {'stage1'..'stage4': [B, V, 2, 4, 4]};
        depth_values: [B, Dfull]; returns the cascade output dict."""
        b, v, h, w, _ = imgs.shape
        flat = imgs.reshape(b * v, h, w, 3).astype(self.dtype)

        c01, c11, c21, c31 = self.encoder(flat, train)
        vit_feat = self.vit_features(flat, b, v, train)  # [B, V, h8, w8, C]
        vit_flat = vit_feat.reshape(b * v, vit_feat.shape[2], vit_feat.shape[3], -1)
        if vit_flat.shape[1] != c31.shape[1] or vit_flat.shape[2] != c31.shape[2]:
            vit_flat = resize2d(vit_flat, c31.shape[1], c31.shape[2],
                                method="linear", align_corners=False)
        c31 = c31 + vit_flat.astype(self.dtype)

        f1, f2, f3, f4 = self.decoder(c01, c11, c21, c31, train)
        features = {
            f"stage{i + 1}": f.reshape(b, v, f.shape[1], f.shape[2], f.shape[3])
            for i, f in enumerate((f1, f2, f3, f4))
        }
        features = self.fmt(features)
        return self.cascade(features, cams, depth_values, tmp, train)
