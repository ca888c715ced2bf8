"""CrossVITDecoder (SVA — side-view attention) over multi-level ViT tokens.

Re-design of reference models/module.py:273-364: the reference view runs a
self-attention chain with learnable `prev_values` blending of each level's
tokens (adaptive aggregation, AAS); each source view runs cross-attention
against the per-level reference features; the fused tokens are projected and
upsampled ×4 with two transposed convs (ViT grid at 0.4375·H/14 = H/32 →
output at H/8, matching the FPN's stage-1 resolution).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .blocks import CrossBlock
from .layers import deconv_pad

Array = jax.Array


class CrossVITDecoder(nn.Module):
    d_model: int = 768
    nhead: int = 12
    cross_interval_layers: int = 3
    variant: str = "linear"  # decoder_cfg.attention_type 'Linear'
    ffn_type: str = "ffn"
    init_values: Optional[float] = 1.0
    prev_values: float = 0.5
    softmax_scale: Optional[str] = "entropy_invariance"
    train_avg_length: Optional[int] = 762
    post_norm: bool = False
    pre_norm_query: bool = True
    no_combine_norm: bool = False
    out_ch: int = 64
    dtype: Any = jnp.float32

    def setup(self):
        n_self = self.cross_interval_layers - 1
        blk = lambda name: CrossBlock(
            dim=self.d_model, num_heads=self.nhead, variant=self.variant,
            ffn_type=self.ffn_type, init_values=self.init_values,
            softmax_scale=self.softmax_scale,
            train_avg_length=self.train_avg_length,
            post_norm=self.post_norm, pre_norm_query=self.pre_norm_query,
            dtype=self.dtype, name=name,
        )
        self.self_blocks = [blk(f"self_attn_{i}") for i in range(n_self)]
        self.cross_blocks = [blk(f"cross_attn_{i}") for i in range(self.cross_interval_layers)]
        if not self.no_combine_norm:
            self.combine_norms = [
                nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name=f"combine_norm_{i}")
                for i in range(n_self)
            ]
        self.prev_value_params = [
            self.param(f"prev_value_{i}", nn.initializers.constant(self.prev_values), (), jnp.float32)
            for i in range(n_self)
        ]
        ch = self.out_ch
        self.proj = nn.Conv(ch * 4, (3, 3), padding="SAME", dtype=self.dtype, name="proj")
        self.proj_bn = nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=jnp.float32, name="proj_bn")
        # torch ConvTranspose2d(4, stride=2, padding=1) semantics (reference
        # models/module.py:319-322): explicit (2, 2) pads + flipped kernels
        up_pad = deconv_pad((4, 4), (2, 2), padding=(1, 1), output_padding=(0, 0))
        self.up0 = nn.ConvTranspose(ch * 2, (4, 4), strides=(2, 2), padding=up_pad,
                                    dtype=self.dtype, name="up0")
        self.up0_bn = nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=jnp.float32, name="up0_bn")
        self.up1 = nn.ConvTranspose(ch, (4, 4), strides=(2, 2), padding=up_pad,
                                    dtype=self.dtype, name="up1")
        self.up1_bn = nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=jnp.float32, name="up1_bn")

    def _combine(self, i: int, prev_feat: Array, level_tokens: Array) -> Array:
        x = self.prev_value_params[i].astype(self.dtype) * prev_feat + level_tokens
        if not self.no_combine_norm:
            x = self.combine_norms[i](x).astype(self.dtype)
        return x

    def __call__(self, levels: Sequence[Array], vit_shape, train: bool = False) -> Array:
        """levels: list of [B, V, HW, C] token arrays (one per tapped ViT
        level); vit_shape: (B, V, h, w, C). Returns [B, V, 4h, 4w, out_ch]."""
        b, v, h, w, c = vit_shape

        # reference view: self-attention chain with AAS
        ref_feats = [levels[0][:, 0].astype(self.dtype)]
        for i, blk in enumerate(self.self_blocks):
            pre = blk(ref_feats[-1])
            ref_feats.append(self._combine(i, pre, levels[i + 1][:, 0].astype(self.dtype)))

        # source views: cross-attention against per-level ref features
        src_outs = []
        for vi in range(1, v):
            src = None
            for i, blk in enumerate(self.cross_blocks):
                if i == 0:
                    query = levels[0][:, vi].astype(self.dtype)
                else:
                    query = self._combine(i - 1, src, levels[i][:, vi].astype(self.dtype))
                src = blk(query, key=ref_feats[i], value=ref_feats[i])
            src_outs.append(src)

        x = jnp.stack([ref_feats[-1]] + src_outs, axis=1)  # [B, V, HW, C]
        x = x.reshape(b * v, h, w, c)

        x = nn.silu(self.proj_bn(self.proj(x), use_running_average=not train)).astype(self.dtype)
        x = nn.silu(self.up0_bn(self.up0(x), use_running_average=not train)).astype(self.dtype)
        x = nn.silu(self.up1_bn(self.up1(x), use_running_average=not train)).astype(self.dtype)
        return x.reshape(b, v, 4 * h, 4 * w, self.out_ch)
