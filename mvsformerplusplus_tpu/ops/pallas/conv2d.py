"""Pallas 3x3 stride-1 conv: one input read + 9 shifted MXU dots.

XLA's TPU conv lowering moves ~6x the necessary bytes on the narrow-channel
high-resolution convs this model is full of (xprof: 64->8 @ [5,1152,1536] =
24.8 ms at 307 GB/s; the decoder head alone is 30 ms/map), and the
shifted-matmul formulation (layers.conv2d_mm) re-reads the input k*k times
because XLA materializes the shifted operands (measured 47.6 ms on the
64-channel head). This kernel reads each input block ONCE:

- grid (B, H/BH); the 3x3 halo comes from two extra 8-row input specs whose
  index maps point at the neighboring row-blocks (clamped at the image
  edges and masked to zero there — torch 'same' zero padding);
- inside, the x-axis is zero-padded in VMEM and the 9 taps are static
  slices feeding [BH*W, Ci] @ [Ci, Co] dots with fp32 accumulation — the
  same contraction XLA's conv performs, minus the data movement.

Forward-only from autodiff's perspective is not enough here (the decoder
and visibility heads train), so conv3x3_p carries a custom VJP: dL/dx is
the same kernel run with the spatially-flipped, ci/co-swapped kernel (the
exact transpose of stride-1 'same' conv), and dL/dK is a 9-tap einsum.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

Array = jax.Array


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _kernel(top_ref, mid_ref, bot_ref, k_ref, out_ref, *, bh: int, w: int,
            ci: int, co: int, nblocks: int):
    i = pl.program_id(1)
    top = top_ref[0, -1:]                    # [1, W, Ci]
    bot = bot_ref[0, :1]
    mid = mid_ref[0]                         # [BH, W, Ci]
    zero = jnp.zeros((), mid.dtype)
    top = jnp.where(i == 0, zero, top)
    bot = jnp.where(i == nblocks - 1, zero, bot)
    xb = jnp.concatenate([top, mid, bot], axis=0)    # [BH+2, W, Ci]
    zcol = jnp.zeros((bh + 2, 1, ci), mid.dtype)
    xp = jnp.concatenate([zcol, xb, zcol], axis=1)   # [BH+2, W+2, Ci]

    k = k_ref[:]                              # [3, 3, Ci, Co]
    acc = jnp.zeros((bh * w, co), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            t = xp[dy:dy + bh, dx:dx + w].reshape(bh * w, ci)
            acc = acc + jax.lax.dot(
                t, k[dy, dx], preferred_element_type=jnp.float32)
    out_ref[0] = acc.reshape(bh, w, co).astype(out_ref.dtype)


def _bh_for(h: int, w: int, ci: int, cap_bytes: int = 6 << 20) -> int:
    """Row-block height: multiple of 8 dividing h, block under ~6MB VMEM."""
    best = 8
    for cand in range(8, min(h, 256) + 1, 8):
        if h % cand == 0 and cand * w * ci * 2 <= cap_bytes:
            best = cand
    return best


def _conv3x3_fwd_impl(x: Array, kernel: Array) -> Array:
    b, h, w, ci = x.shape
    co = kernel.shape[-1]
    bh = _bh_for(h, w, ci)
    nblocks = h // bh
    return pl.pallas_call(
        functools.partial(_kernel, bh=bh, w=w, ci=ci, co=co,
                          nblocks=nblocks),
        grid=(b, nblocks),
        in_specs=[
            pl.BlockSpec((1, 8, w, ci),
                         lambda bi, i: (bi, jnp.maximum(i * (bh // 8) - 1, 0),
                                        0, 0)),
            pl.BlockSpec((1, bh, w, ci), lambda bi, i: (bi, i, 0, 0)),
            pl.BlockSpec((1, 8, w, ci),
                         lambda bi, i: (bi, jnp.minimum(i * (bh // 8) + bh // 8,
                                                        h // 8 - 1), 0, 0)),
            pl.BlockSpec((3, 3, ci, co), lambda bi, i: (0, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bh, w, co), lambda bi, i: (bi, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, w, co), x.dtype),
        interpret=_interpret(),
    )(x, x, x, kernel)


@jax.custom_vjp
def conv3x3_p(x: Array, kernel: Array) -> Array:
    """3x3 stride-1 'same' (torch zero-pad) conv, Pallas-fused.

    x: [B, H, W, Ci] (H % 8 == 0); kernel: [3, 3, Ci, Co].
    """
    return _conv3x3_fwd_impl(x, kernel)


def _conv3x3_fwd(x, kernel):
    return _conv3x3_fwd_impl(x, kernel), (x, kernel)


def _conv3x3_bwd(res, g):
    x, kernel = res
    # dX: stride-1 'same' conv transpose == same conv with the spatially
    # flipped kernel and ci/co swapped
    kt = jnp.flip(kernel, axis=(0, 1)).transpose(0, 1, 3, 2)
    dx = _conv3x3_fwd_impl(g.astype(x.dtype), kt.astype(kernel.dtype))
    # dK[dy, dx, ci, co] = sum_pixels x_shifted[.., ci] * g[.., co]
    b, h, w, ci = x.shape
    xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (1, 1), (1, 1), (0, 0)))
    gf = g.astype(jnp.float32)
    taps = []
    for dy in range(3):
        row = []
        for dxx in range(3):
            t = jax.lax.slice(xp, (0, dy, dxx, 0), (b, dy + h, dxx + w, ci))
            row.append(jnp.einsum("bhwc,bhwo->co", t, gf))
        taps.append(jnp.stack(row))
    dk = jnp.stack(taps).astype(kernel.dtype)
    return dx, dk


conv3x3_p.defvjp(_conv3x3_fwd, _conv3x3_bwd)
