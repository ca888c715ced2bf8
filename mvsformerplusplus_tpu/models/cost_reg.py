"""Cost-volume regularizers: 3D U-Nets and the pure-transformer (CTA) reg.

Volumes are NDHWC ([B, D, H, W, C]) — channel-last 3D convs are XLA TPU's
native layout. The U-Nets mirror the reference's topology
(models/module.py:367-504); the CTA regularizer re-designs
PureTransformerCostReg (models/module.py:602-646) with patchify/unpatchify as
stride=kernel conv / transposed conv and Pallas flash attention over
(H·W·D)-token streams.

Rematerialization: the reference gradient-checkpoints the U-Nets
(models/module.py:393-396, 488-492); here the cascade applies jax.checkpoint
around stage calls (models/stagenet.py), trading FLOPs for HBM exactly like
the reference does.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.pe import position_encoding_3d
from .blocks import FlashAttnBlock
from .layers import Conv3dBlock, Deconv3dBlock, LayerNorm3D

Array = jax.Array
Dtype = Any


class CostRegNet(nn.Module):
    """3D U-Net, stride-2 in (D, H, W) (reference models/module.py:367-408)."""

    base_channels: int
    last_layer: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        bc = self.base_channels
        in_ch = x.shape[-1]
        conv0 = x
        conv2 = Conv3dBlock(bc * 2, dtype=self.dtype)(
            Conv3dBlock(bc * 2, stride=2, dtype=self.dtype)(conv0, train), train)
        conv4 = Conv3dBlock(bc * 4, dtype=self.dtype)(
            Conv3dBlock(bc * 4, stride=2, dtype=self.dtype)(conv2, train), train)
        x = Conv3dBlock(bc * 8, dtype=self.dtype)(
            Conv3dBlock(bc * 8, stride=2, dtype=self.dtype)(conv4, train), train)
        x = conv4 + Deconv3dBlock(bc * 4, stride=(2, 2, 2), dtype=self.dtype)(x, train)
        x = conv2 + Deconv3dBlock(bc * 2, stride=(2, 2, 2), dtype=self.dtype)(x, train)
        up = Deconv3dBlock(bc, stride=(2, 2, 2), dtype=self.dtype)(x, train)
        if in_ch != bc:
            inner = nn.Conv(bc, (1, 1, 1), dtype=self.dtype)(conv0)
        else:
            inner = conv0
        x = inner + up
        if self.last_layer:
            x = nn.Conv(1, (3, 3, 3), padding="SAME", use_bias=False, dtype=self.dtype)(x)
        return x


class CostRegNet3D(nn.Module):
    """3D U-Net with (H, W)-only strides — keeps the D axis dense; used when
    ndepth <= 8 (reference models/module.py:453-504)."""

    base_channels: int
    log_var: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        bc = self.base_channels
        in_ch = x.shape[-1]
        s = (1, 2, 2)
        conv0 = x
        conv2 = Conv3dBlock(bc * 2, dtype=self.dtype)(
            Conv3dBlock(bc * 2, stride=s, dtype=self.dtype)(conv0, train), train)
        conv4 = Conv3dBlock(bc * 4, dtype=self.dtype)(
            Conv3dBlock(bc * 4, stride=s, dtype=self.dtype)(conv2, train), train)
        x = Conv3dBlock(bc * 8, dtype=self.dtype)(
            Conv3dBlock(bc * 8, stride=s, dtype=self.dtype)(conv4, train), train)
        x = conv4 + Deconv3dBlock(bc * 4, stride=s, dtype=self.dtype)(x, train)
        x = conv2 + Deconv3dBlock(bc * 2, stride=s, dtype=self.dtype)(x, train)
        up = Deconv3dBlock(bc, stride=s, dtype=self.dtype)(x, train)
        if in_ch != bc:
            inner = nn.Conv(bc, (1, 1, 1), dtype=self.dtype)(conv0)
        else:
            inner = conv0
        x = inner + up
        out = 2 if self.log_var else 1
        return nn.Conv(out, (1, 1, 1), dtype=self.dtype)(x)


class CostRegNet2D(nn.Module):
    """U-Net with 1×3×3 kernels on the downsample path (reference
    models/module.py:411-450)."""

    base_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        bc = self.base_channels
        s = (1, 2, 2)
        k = (1, 3, 3)
        conv0 = x
        conv2 = Conv3dBlock(bc * 2, dtype=self.dtype)(
            Conv3dBlock(bc * 2, kernel_size=k, stride=s, dtype=self.dtype)(conv0, train), train)
        conv4 = Conv3dBlock(bc * 4, dtype=self.dtype)(
            Conv3dBlock(bc * 4, kernel_size=k, stride=s, dtype=self.dtype)(conv2, train), train)
        x = Conv3dBlock(bc * 8, dtype=self.dtype)(
            Conv3dBlock(bc * 8, kernel_size=k, stride=s, dtype=self.dtype)(conv4, train), train)
        x = conv4 + Deconv3dBlock(bc * 4, kernel_size=k, stride=s, dtype=self.dtype)(x, train)
        x = conv2 + Deconv3dBlock(bc * 2, kernel_size=k, stride=s, dtype=self.dtype)(x, train)
        x = conv0 + Deconv3dBlock(bc, kernel_size=k, stride=s, dtype=self.dtype)(x, train)
        return nn.Conv(1, (1, 1, 1), dtype=self.dtype)(x)


class PureTransformerCostReg(nn.Module):
    """CTA: 3D-PE add + conv patchify + N transformer blocks + unpatchify.

    Reference models/module.py:602-646. Token order is (h, w, d) with d
    fastest (reference rearrange 'b c d h w -> b (h w d) c').
    """

    base_channel: int = 8
    mid_channel: int = 64
    num_heads: int = 4
    mlp_ratio: float = 4.0
    layer_num: int = 6
    down_rate: Tuple[int, int, int] = (2, 4, 4)  # (D, H, W)
    position_encoding: bool = True
    use_pe_proj: bool = True
    softmax_scale: Optional[str] = "entropy_invariance"
    train_avg_length: Optional[int] = 12185
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, position3d: Optional[Array] = None,
                 train: bool = False) -> Array:
        b, d, h, w, c = x.shape
        if position3d is not None and self.position_encoding:
            if self.use_pe_proj:
                pe = position_encoding_3d(position3d, self.base_channel)  # [B,D,H,W,3C]
                pe = nn.Conv(self.base_channel, (1, 1, 1), use_bias=False,
                             dtype=self.dtype, name="pe_proj")(pe.astype(self.dtype))
            else:
                pe = position_encoding_3d(position3d, c // 3).astype(self.dtype)
            x = x + pe

        rd, rh, rw = self.down_rate
        x = nn.Conv(self.mid_channel, (rd, rh, rw), strides=(rd, rh, rw),
                    padding="VALID", dtype=self.dtype, name="down")(x)
        x = LayerNorm3D(dtype=self.dtype, name="down_norm")(x)

        bd, bh, bw = x.shape[1], x.shape[2], x.shape[3]
        # (h w d) token order, d fastest
        tokens = jnp.transpose(x, (0, 2, 3, 1, 4)).reshape(b, bh * bw * bd, self.mid_channel)
        for i in range(self.layer_num):
            tokens = FlashAttnBlock(
                dim=self.mid_channel, num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio, variant="softmax",
                softmax_scale=self.softmax_scale,
                train_avg_length=self.train_avg_length,
                post_norm=True, dtype=self.dtype, name=f"block{i}",
            )(tokens)
        x = tokens.reshape(b, bh, bw, bd, self.mid_channel).transpose(0, 3, 1, 2, 4)

        x = nn.ConvTranspose(self.base_channel, (rd, rh, rw), strides=(rd, rh, rw),
                             padding="VALID", dtype=self.dtype, name="up")(x)
        x = LayerNorm3D(dtype=self.dtype, name="up_norm")(x)
        return nn.Conv(1, (1, 1, 1), dtype=self.dtype, name="prob")(x)
