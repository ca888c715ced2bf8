"""DINOv2 ViT backbone (frozen feature extractor) in flax.

Re-design of the vendored DINOv2 (reference models/dino/dinov2.py): ViT-B/14
patch embed + 12 pre-norm blocks with LayerScale, intermediate patch-token
taps every depth/cross_interval_layers blocks plus the final norm'd tokens
(forward_interval_features, dinov2.py:249-266), and bicubic pos-embed
interpolation for arbitrary input resolution (dinov2.py:176-200, done here as
a matmul resize).

The backbone is frozen (dinov2.py:164-165): the flagship model wraps calls in
stop_gradient and the optimizer masks these params out; weights come from the
converted `dinov2_vitb14_pretrain.pth` (tools/convert_dinov2.py).

Param layout keeps a 1:1 mapping to the torch state dict (fused qkv, names
patch_embed/blocks_i/norm) so conversion is mechanical.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.resize import resize2d

Array = jax.Array


class DinoAttention(nn.Module):
    """Fused-qkv multi-head self attention (reference
    models/dino/layers/attention.py:51-101; plain d^-0.5 scale — config
    dino_cfg.softmax_scale is null)."""

    dim: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, n, c = x.shape
        dh = self.dim // self.num_heads
        qkv = nn.Dense(3 * self.dim, use_bias=True, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv.reshape(b, n, 3, self.num_heads, dh), 3, axis=2)
        q, k, v = q[:, :, 0], k[:, :, 0], v[:, :, 0]
        from ..ops.attention import softmax_attention

        out = softmax_attention(q, k, v, dh ** -0.5)
        out = out.reshape(b, n, c).astype(self.dtype)
        return nn.Dense(self.dim, use_bias=True, dtype=self.dtype, name="proj")(out)


class DinoBlock(nn.Module):
    """Pre-norm ViT block with LayerScale (reference models/dino/layers/
    block.py:36-124; drop-path is identity at inference and the backbone is
    frozen, so it is omitted)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    init_values: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        ls1 = self.param("ls1_gamma", nn.initializers.constant(self.init_values),
                         (self.dim,), jnp.float32)
        ls2 = self.param("ls2_gamma", nn.initializers.constant(self.init_values),
                         (self.dim,), jnp.float32)
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm1")(x).astype(self.dtype)
        h = DinoAttention(self.dim, self.num_heads, dtype=self.dtype, name="attn")(h)
        x = x + h * ls1.astype(self.dtype)
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm2")(x).astype(self.dtype)
        hid = int(self.dim * self.mlp_ratio)
        h = nn.Dense(hid, dtype=self.dtype, name="mlp_fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(h)
        return x + h * ls2.astype(self.dtype)


class DinoVisionTransformer(nn.Module):
    """ViT backbone with interval feature taps.

    __call__(imgs [B, H, W, 3]) -> list of `num_taps` patch-token arrays
    [B, h0*w0, C] where (h0, w0) = (H//patch, W//patch).
    """

    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    patch_size: int = 14
    mlp_ratio: float = 4.0
    init_values: float = 1.0
    pretrain_grid: int = 37  # 518 // 14
    cross_interval_layers: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, imgs: Array) -> Sequence[Array]:
        b, h, w, _ = imgs.shape
        h0, w0 = h // self.patch_size, w // self.patch_size

        x = nn.Conv(
            self.embed_dim, (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size), padding="VALID",
            dtype=self.dtype, name="patch_embed",
        )(imgs.astype(self.dtype))
        x = x.reshape(b, h0 * w0, self.embed_dim)

        cls_token = self.param("cls_token", nn.initializers.zeros,
                               (1, 1, self.embed_dim), jnp.float32)
        pos_embed = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (1, self.pretrain_grid * self.pretrain_grid + 1, self.embed_dim),
            jnp.float32,
        )
        # bicubic pos-embed interpolation (reference dinov2.py:176-200)
        g = self.pretrain_grid
        if (h0, w0) != (g, g):
            patch_pe = pos_embed[:, 1:].reshape(1, g, g, self.embed_dim)
            # torch interpolates with scale_factor=(g0+0.1)/g — the +0.1 fudge
            # changes the sample coordinates; match it exactly
            patch_pe = resize2d(patch_pe, h0, w0, method="cubic", align_corners=False,
                                scale_h=(h0 + 0.1) / g, scale_w=(w0 + 0.1) / g)
            patch_pe = patch_pe.reshape(1, h0 * w0, self.embed_dim)
        else:
            patch_pe = pos_embed[:, 1:]

        x = jnp.concatenate(
            [jnp.broadcast_to(cls_token.astype(self.dtype), (b, 1, self.embed_dim)), x],
            axis=1,
        )
        pe = jnp.concatenate([pos_embed[:, :1], patch_pe], axis=1)
        x = x + pe.astype(self.dtype)

        interval = self.depth // self.cross_interval_layers
        feats = []
        for i in range(self.depth):
            x = DinoBlock(
                self.embed_dim, self.num_heads, self.mlp_ratio,
                self.init_values, dtype=self.dtype, name=f"blocks_{i}",
            )(x)
            if (i + 1) % interval == 0 and i != self.depth - 1:
                feats.append(x[:, 1:])
        x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm")(x).astype(self.dtype)
        feats.append(x[:, 1:])
        return feats
