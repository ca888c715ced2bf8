"""Pallas 3x3 stride-1 conv: one input read + shifted MXU dots, W-folded.

XLA's TPU conv lowering moves ~6x the necessary bytes on the narrow-channel
high-resolution convs this model is full of (xprof: 64->8 @ [5,1152,1536] =
24.8 ms at 307 GB/s; the decoder head alone is 30 ms/map), and the
shifted-matmul formulation (layers.conv2d_mm) re-reads the input k*k times
because XLA materializes the shifted operands. This kernel reads each input
block ONCE, and — the part that makes it VMEM-viable — folds W-pixels into
channels first so every VMEM buffer has >= 128 lanes:

- channels-last blocks with C=8-16 pad the (8/16, 128) tile up to 16x
  inside the kernel too: the un-folded version of this kernel blew the 16MB
  scoped-vmem limit (24MB at [5,1152,1536,16]). Folding F = 128/C W-pixels
  into channels is a FREE reshape of a channels-last array, and a 3-tap
  conv stays a 3-tap conv in folded space (taps {-1,0,1} blocks) with a
  block-structured kernel built by fold_w_kernel — exact, zero extra FLOPs.
- grid (B, H/BH); the y-halo comes from two extra 8-row input specs with
  clamped index maps (edge rows masked to zero = torch 'same' zero pad);
  the x-halo is a zeroed folded column (only its last pixel is ever
  referenced by the fold indicator, matching the 1-pixel true pad).
- the 9 folded taps are static VMEM slices feeding
  [BH*W', F*Ci] @ [F*Ci, F*Co] dots with fp32 accumulation.

conv3x3_p carries a custom VJP (the decoder/visibility heads train): dL/dx
is the same kernel with the spatially-flipped, ci/co-swapped kernel; dL/dK
is a 9-tap einsum.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

Array = jax.Array


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def fold_w_kernel(k: Array, f: int) -> Array:
    """[3, 3, ci, co] -> [3, 3, f*ci, f*co]: the exact 3x3 conv on the
    W-folded layout ([B, H, W/f, f*C]). Output fold-position b at folded
    column X reads input pixel X*f + b + dx - 1 = folded (X + o, a) with
    o in {-1, 0, 1}; same FLOPs (the indicator is 0/1)."""
    kx, ci, co = k.shape[1], k.shape[2], k.shape[3]
    a = jnp.arange(f)[None, :, None, None]
    bpos = jnp.arange(f)[None, None, :, None]
    dx = jnp.arange(kx)[:, None, None, None]
    o = jnp.arange(3)[None, None, None, :] - 1
    i = bpos + dx - (kx - 1) // 2
    m = (a == i - o * f).astype(k.dtype)         # [kx, f(a), f(b), 3(o)]
    w2 = jnp.einsum("yxio,xabq->yqaibo", k, m)
    return w2.reshape(3, 3, f * ci, f * co)


def _kernel(top_ref, mid_ref, bot_ref, k_ref, out_ref, *, bh: int, wf: int,
            cif: int, cof: int, nblocks: int):
    i = pl.program_id(1)
    top = top_ref[0, -1:]                    # [1, W', Ci']
    bot = bot_ref[0, :1]
    mid = mid_ref[0]                         # [BH, W', Ci']
    zero = jnp.zeros((), mid.dtype)
    top = jnp.where(i == 0, zero, top)
    bot = jnp.where(i == nblocks - 1, zero, bot)
    xb = jnp.concatenate([top, mid, bot], axis=0)    # [BH+2, W', Ci']
    zcol = jnp.zeros((bh + 2, 1, cif), mid.dtype)
    xp = jnp.concatenate([zcol, xb, zcol], axis=1)   # [BH+2, W'+2, Ci']

    k = k_ref[:]                              # [3, 3, Ci', Co']
    # rank-3 dots (no [BH*W', Ci'] flatten): the flattened tap slices each
    # materialized a VMEM copy and the 9 live copies blew the scoped-vmem
    # limit at wide rows
    dn = (((2,), (0,)), ((), ()))
    acc = jnp.zeros((bh, wf, cof), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            acc = acc + jax.lax.dot_general(
                xp[dy:dy + bh, dx:dx + wf], k[dy, dx], dn,
                preferred_element_type=jnp.float32)
    out_ref[0] = acc.astype(out_ref.dtype)


def _footprint(bh: int, wf: int, cif: int, cof: int) -> int:
    """Scoped-VMEM model for one program: 3 input blocks + padded concat +
    9 materialized tap slices + dot temps (~14 input-block-sized bf16
    buffers, matched against compile-time OOM dumps) + two fp32
    accumulator-sized buffers + the folded weight."""
    in_block = bh * wf * cif * 2
    acc = bh * wf * cof * 4
    return 14 * in_block + 2 * acc + 9 * cif * cof * 2


def _bh_for(h: int, wf: int, cif: int, cof: int,
            cap_bytes: int = 10 << 20) -> int:
    """Largest row-block height (multiple of 8 dividing h) whose modeled
    footprint fits; 0 when even 8 rows do not (callers must fall back)."""
    best = 0
    for cand in range(8, min(h, 256) + 1, 8):
        if h % cand == 0 and _footprint(cand, wf, cif, cof) <= cap_bytes:
            best = cand
    return best


def _fold_factor(w: int, ci: int, co: int) -> int:
    """Fold enough W-pixels for >=128 input lanes, but cap the folded
    OUTPUT width (f*co > 512 blows the weight/accumulator VMEM for
    extreme ci:co ratios)."""
    f = max(1, 128 // ci)
    while f > 1 and (w % f or f * co > 512):
        f //= 2
    return f


def conv3x3_viable(h: int, w: int, ci: int, co: int) -> bool:
    """Can conv3x3_p run this shape within the VMEM model?"""
    if h % 8 or h < 8 or ci < 8:
        return False
    f = _fold_factor(w, ci, co)
    return _bh_for(h, w // f, f * ci, f * co) > 0


def _conv3x3_fwd_impl(x: Array, kernel: Array) -> Array:
    b, h, w, ci = x.shape
    co = kernel.shape[-1]
    f = _fold_factor(w, ci, co)
    wf, cif, cof = w // f, f * ci, f * co
    xf = x.reshape(b, h, wf, cif)            # free: channels-last W-fold
    kf = fold_w_kernel(kernel, f) if f > 1 else kernel
    bh = _bh_for(h, wf, cif, cof)
    assert bh > 0, ("conv3x3_p gated by conv3x3_viable", x.shape, co)
    nblocks = h // bh
    out = pl.pallas_call(
        functools.partial(_kernel, bh=bh, wf=wf, cif=cif, cof=cof,
                          nblocks=nblocks),
        grid=(b, nblocks),
        in_specs=[
            pl.BlockSpec((1, 8, wf, cif),
                         lambda bi, i: (bi, jnp.maximum(i * (bh // 8) - 1, 0),
                                        0, 0)),
            pl.BlockSpec((1, bh, wf, cif), lambda bi, i: (bi, i, 0, 0)),
            pl.BlockSpec((1, 8, wf, cif),
                         lambda bi, i: (bi, jnp.minimum(i * (bh // 8) + bh // 8,
                                                        h // 8 - 1), 0, 0)),
            pl.BlockSpec((3, 3, cif, cof), lambda bi, i: (0, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bh, wf, cof), lambda bi, i: (bi, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, wf, cof), x.dtype),
        interpret=_interpret(),
    )(xf, xf, xf, kf)
    return out.reshape(b, h, w, co)


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
