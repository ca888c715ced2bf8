"""Sinusoidal position encodings (2-D image and 3-D frustum).

Pure functions of static shapes — under jit each (H, W) bucket compiles its
PE as a constant, which supersedes the reference's mutable `pe_dict` cache
(models/position_encoding.py:59-89; the cache the reference has to strip from
checkpoints simply doesn't exist here).
"""
from __future__ import annotations

import math
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@lru_cache(maxsize=None)
def _sine_pe_2d_np(d_model: int, height: int, width: int, norm_h: int, norm_w: int) -> np.ndarray:
    """[H, W, C] resolution-normalized 2-D sine PE.

    Matches PositionEncodingSineNorm.reset_pe (reference
    models/position_encoding.py:61-74): positions are 1-based cumsums scaled
    by max_shape/size, channels interleave sin/cos of x then y per frequency.
    """
    y_pos = (np.arange(1, height + 1, dtype=np.float64)[:, None] * norm_h / height)
    x_pos = (np.arange(1, width + 1, dtype=np.float64)[None, :] * norm_w / width)
    y_pos = np.broadcast_to(y_pos, (height, width))
    x_pos = np.broadcast_to(x_pos, (height, width))
    div = np.exp(
        np.arange(0, d_model // 2, 2, dtype=np.float64) * (-math.log(10000.0) / (d_model // 2))
    )  # [C//4]
    pe = np.zeros((d_model, height, width), dtype=np.float64)
    pe[0::4] = np.sin(x_pos[None] * div[:, None, None])
    pe[1::4] = np.cos(x_pos[None] * div[:, None, None])
    pe[2::4] = np.sin(y_pos[None] * div[:, None, None])
    pe[3::4] = np.cos(y_pos[None] * div[:, None, None])
    return np.moveaxis(pe.astype(np.float32), 0, -1)  # [H, W, C]


def sine_pe_2d(d_model: int, height: int, width: int, max_shape=(128, 128)) -> Array:
    """Resolution-normalized sine PE, [H, W, C]."""
    return jnp.asarray(_sine_pe_2d_np(d_model, height, width, max_shape[0], max_shape[1]))


def add_sine_pe(x: Array, max_shape=(128, 128)) -> Array:
    """x: [B, H, W, C] -> x + PE (cast to x.dtype)."""
    _, h, w, c = x.shape
    return x + sine_pe_2d(c, h, w, max_shape).astype(x.dtype)


def position_encoding_3d_parts(position3d: Array, channels: int,
                               rescale: float = 4.0) -> Array:
    """Per-axis sin/cos encoding BEFORE the axis concat: [B, 3, D, H, W, C]
    (axis a holds x/y/z; channel interleaves sin/cos). The folded CTA path
    consumes this directly so the [B, D, H, W, 3C] intermediate (3C=24
    minor: 5x lane padding) never materializes."""
    b, _, d, h, w = position3d.shape
    div = jnp.exp(
        jnp.arange(0, channels, 2, dtype=jnp.float32) * (-math.log(10000.0) / channels)
    )  # [C/2]
    pos = position3d.astype(jnp.float32) * rescale  # [B, 3, D, H, W]
    ang = pos[..., None] * div  # [B, 3, D, H, W, C/2]
    sin = jnp.sin(ang)
    cos = jnp.cos(ang)
    # interleave sin/cos along the channel axis: pe[0::2]=sin, pe[1::2]=cos
    return jnp.stack([sin, cos], axis=-1).reshape(b, 3, d, h, w, channels)


def position_encoding_3d(position3d: Array, channels: int, rescale: float = 4.0) -> Array:
    """Sin/cos encoding of normalized frustum XYZ.

    position3d: [B, 3, D, H, W] in [0, 1] -> [B, D, H, W, 3*channels]
    (reference models/position_encoding.py:164-189, channel-last here).
    """
    b, _, d, h, w = position3d.shape
    inter = position_encoding_3d_parts(position3d, channels, rescale)
    # axis order x, y, z concatenated -> [B, D, H, W, 3C]
    return jnp.moveaxis(inter, 1, -2).reshape(b, d, h, w, 3 * channels)
