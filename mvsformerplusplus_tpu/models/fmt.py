"""FMT — Feature Matching Transformer + multi-scale pathway.

Re-design of reference models/FMT.py. At stage-1 (1/8) resolution the
reference runs the reference view through the 'self' layers of an
interleaved ['self','cross','self','cross'] stack (caching each self output),
then runs every source view through the full stack with cross-attention
against the cached reference features. The FPN-style pathway then propagates
the attended stage-1 features down to stages 2-4 by 1×1 dim reduction +
bilinear upsample-add + 3×3 smoothing (models/FMT.py:140-206).

TPU notes: tokens are [B, HW, C] with C=64 — linear attention (config
attention_type 'Linear') is two tiny einsums; position encoding is a
trace-time constant per (H, W) bucket; pathway upsampling is the matmul
resize (align_corners=False, matching F.interpolate default).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.pe import sine_pe_2d
from ..ops.resize import resize2d
from .blocks import CrossBlock
from .layers import MMConv

Array = jax.Array


class FMT(nn.Module):
    """Interleaved self/cross attention over stage-1 feature tokens."""

    d_model: int = 64
    nhead: int = 4
    layer_names: Sequence[str] = ("self", "cross", "self", "cross")
    variant: str = "linear"  # config attention_type 'Linear'
    ffn_type: str = "ffn"
    init_values: Optional[float] = 1.0
    softmax_scale: Optional[str] = "entropy_invariance"
    train_avg_length: Optional[int] = 12185
    post_norm: bool = False
    pre_norm_query: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        self.layers = [
            CrossBlock(
                dim=self.d_model, num_heads=self.nhead, variant=self.variant,
                ffn_type=self.ffn_type, init_values=self.init_values,
                softmax_scale=self.softmax_scale,
                train_avg_length=self.train_avg_length,
                post_norm=self.post_norm, pre_norm_query=self.pre_norm_query,
                dtype=self.dtype, name=f"layer{i}",
            )
            for i in range(len(self.layer_names))
        ]

    def forward_ref(self, ref_feature: Array):
        """ref_feature [B, H, W, C] -> list of per-self-layer features
        (reference models/FMT.py:90-106)."""
        b, h, w, c = ref_feature.shape
        x = (ref_feature + sine_pe_2d(c, h, w).astype(ref_feature.dtype)).reshape(b, h * w, c)
        outs = []
        for layer, name in zip(self.layers, self.layer_names):
            if name == "self":
                x = layer(x)
                outs.append(x)
        return outs, (h, w)

    def forward_src(self, ref_feature_list, src_feature: Array):
        """src [B, H, W, C] attends against cached ref features
        (reference models/FMT.py:108-135)."""
        b, h, w, c = src_feature.shape
        x = (src_feature + sine_pe_2d(c, h, w).astype(src_feature.dtype)).reshape(b, h * w, c)
        for i, (layer, name) in enumerate(zip(self.layers, self.layer_names)):
            if name == "self":
                x = layer(x)
            else:
                ref_idx = i if len(ref_feature_list) == len(self.layers) else i // 2
                ref = ref_feature_list[ref_idx]
                x = layer(x, key=ref, value=ref)
        return x.reshape(b, h, w, c)


class FMTWithPathway(nn.Module):
    """FMT at stage 1 + top-down pathway into stages 2-4."""

    base_channel: int = 8
    fmt_config: Optional[dict] = None
    dtype: Any = jnp.float32

    def setup(self):
        cfg = dict(self.fmt_config or {})
        cfg.pop("base_channel", None)
        cfg.pop("attn_backend", None)
        cfg.pop("self_cross_types", None)
        variant = {"Linear": "linear", "FLASH2": "softmax", "XFormers": "softmax"}.get(
            cfg.pop("attention_type", "Linear"), "linear"
        )
        self.fmt = FMT(
            d_model=cfg.get("d_model", 64),
            nhead=cfg.get("nhead", 4),
            layer_names=tuple(cfg.get("layer_names", ("self", "cross", "self", "cross"))),
            variant=variant,
            ffn_type=cfg.get("ffn_type", "ffn"),
            init_values=cfg.get("init_values", 1.0),
            softmax_scale=cfg.get("softmax_scale", "entropy_invariance"),
            train_avg_length=cfg.get("train_avg_length", 12185),
            post_norm=cfg.get("post_norm", False),
            pre_norm_query=cfg.get("pre_norm_query", False),
            dtype=self.dtype,
        )
        bc = self.base_channel
        # MMConv: the pathway's smooth convs run at 1/2 and 1/1 resolution
        # with 8-16 channels where XLA's conv lowering moves ~6x the bytes
        # (layers.conv2d_mm); same param tree as nn.Conv
        self.dim_reduction_1 = MMConv(bc * 4, (1, 1), use_bias=False, dtype=self.dtype)
        self.dim_reduction_2 = MMConv(bc * 2, (1, 1), use_bias=False, dtype=self.dtype)
        self.dim_reduction_3 = MMConv(bc, (1, 1), use_bias=False, dtype=self.dtype)
        self.smooth_1 = MMConv(bc * 4, (3, 3), use_bias=False, dtype=self.dtype)
        self.smooth_2 = MMConv(bc * 2, (3, 3), use_bias=False, dtype=self.dtype)
        self.smooth_3 = MMConv(bc, (3, 3), use_bias=False, dtype=self.dtype)

    def _upsample_add(self, x: Array, y: Array) -> Array:
        """Bilinear (half-pixel, matching F.interpolate default) + add
        (reference models/FMT.py:154-162; its fp32 cast is an fp16-overflow
        guard — bf16 carries fp32's exponent range, so the bf16 path resizes
        in model dtype with fp32 accumulation, see ops/resize.py)."""
        h, w = y.shape[1], y.shape[2]
        up = resize2d(x, h, w, method="linear", align_corners=False)
        return (up.astype(jnp.float32) + y.astype(jnp.float32)).astype(self.dtype)

    def __call__(self, features: Dict[str, Array]) -> Dict[str, Array]:
        """features: {'stage1': [B, V, H, W, C], ... 'stage4'} -> same keys."""
        b, v = features["stage1"].shape[:2]
        s1, s2, s3, s4 = [], [], [], []
        ref_list = None
        for vi in range(v):
            if vi == 0:
                ref_list, (h, w) = self.fmt.forward_ref(features["stage1"][:, 0])
                c = features["stage1"].shape[-1]
                f1 = ref_list[-1].reshape(b, h, w, c)
            else:
                f1 = self.fmt.forward_src(ref_list, features["stage1"][:, vi])
            s1.append(f1)
            f2 = self.smooth_1(self._upsample_add(self.dim_reduction_1(f1), features["stage2"][:, vi]))
            s2.append(f2)
            f3 = self.smooth_2(self._upsample_add(self.dim_reduction_2(f2), features["stage3"][:, vi]))
            s3.append(f3)
            f4 = self.smooth_3(self._upsample_add(self.dim_reduction_3(f3), features["stage4"][:, vi]))
            s4.append(f4)
        return {
            "stage1": jnp.stack(s1, axis=1),
            "stage2": jnp.stack(s2, axis=1),
            "stage3": jnp.stack(s3, axis=1),
            "stage4": jnp.stack(s4, axis=1),
        }
