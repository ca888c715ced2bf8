"""Pallas odd-k stride-1 conv: one input read + shifted MXU dots, W-folded.

XLA's TPU conv lowering moves ~6x the necessary bytes on the narrow-channel
high-resolution convs this model is full of (xprof: 64->8 @ [5,1152,1536] =
24.8 ms at 307 GB/s; the decoder head alone is 30 ms/map), and the
shifted-matmul formulation (layers.conv2d_mm) re-reads the input k*k times
because XLA materializes the shifted operands. This kernel reads each input
block ONCE, and — the part that makes it VMEM-viable — folds W-pixels into
channels first so every VMEM buffer has >= ~128 lanes:

- channels-last blocks with C=8-16 pad the (8/16, 128) tile up to 16x
  inside the kernel too: the un-folded version of this kernel blew the 16MB
  scoped-vmem limit (24MB at [5,1152,1536,16]). Folding F W-pixels into
  channels is a FREE reshape of a channels-last array, and a kx-tap conv
  becomes a 3-FOLDED-tap conv in folded space whenever (kx-1)//2 <= F
  (taps {-1,0,1} blocks) with a block-structured kernel built by
  fold_w_kernel — exact, zero extra FLOPs.
- grid (B, H/BH); the y-halo comes from two extra 8-row input specs with
  clamped index maps (edge rows masked to zero = torch 'same' zero pad) —
  py = (ky-1)//2 <= 8 rows, which covers every kernel this model uses
  (3x3 / 5x5 / 7x7: reference models/module.py:208-239 encoder stack);
- the x-halo is zeroed folded columns (only their edge pixels are ever
  referenced by the fold indicator, matching the true (kx-1)//2 pad);
- the ky*3 folded taps are static VMEM slices feeding
  [BH, W', F*Ci] @ [F*Ci, F*Co] dots with fp32 accumulation.

conv2d_p carries a custom VJP (the decoder/visibility heads train): dL/dx
is the same kernel with the spatially-flipped, ci/co-swapped kernel; dL/dK
is a ky*kx-tap einsum.
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
    """[ky, kx, ci, co] -> [ky, 3, f*ci, f*co]: the exact ky-x-kx conv on the
    W-folded layout ([B, H, W/f, f*C]). Output fold-position b at folded
    column X reads input pixel X*f + b + dx - (kx-1)//2 = folded (X + o, a)
    with o in {-1, 0, 1} (requires (kx-1)//2 <= f); same FLOPs (the
    indicator is 0/1)."""
    ky, kx, ci, co = k.shape
    p = (kx - 1) // 2
    assert p <= f, (kx, f)
    a = jnp.arange(f)[None, :, None, None]
    bpos = jnp.arange(f)[None, None, :, None]
    dx = jnp.arange(kx)[:, None, None, None]
    o = jnp.arange(3)[None, None, None, :] - 1
    i = bpos + dx - p
    m = (a == i - o * f).astype(k.dtype)         # [kx, f(a), f(b), 3(o)]
    w2 = jnp.einsum("yxio,xabq->yqaibo", k, m)
    return w2.reshape(ky, 3, f * ci, f * co)


def _kernel(top_ref, mid_ref, bot_ref, k_ref, out_ref, *, bh: int, wf: int,
            cif: int, cof: int, nblocks: int, ky: int, kxf: int):
    py = (ky - 1) // 2
    pxf = (kxf - 1) // 2
    i = pl.program_id(1)
    mid = mid_ref[0]                         # [BH, W', Ci']
    zero = jnp.zeros((), mid.dtype)
    rows = [mid]
    if py:
        top = top_ref[0, -py:]               # [py, W', Ci']
        bot = bot_ref[0, :py]
        top = jnp.where(i == 0, zero, top)
        bot = jnp.where(i == nblocks - 1, zero, bot)
        rows = [top, mid, bot]
    xb = jnp.concatenate(rows, axis=0) if py else mid  # [BH+2py, W', Ci']
    if pxf:
        zcol = jnp.zeros((bh + 2 * py, pxf, cif), mid.dtype)
        xp = jnp.concatenate([zcol, xb, zcol], axis=1)
    else:
        xp = xb

    k = k_ref[:]                              # [ky, kxf, Ci', Co']
    # rank-3 dots (no [BH*W', Ci'] flatten): the flattened tap slices each
    # materialized a VMEM copy and the 9 live copies blew the scoped-vmem
    # limit at wide rows
    dn = (((2,), (0,)), ((), ()))
    acc = jnp.zeros((bh, wf, cof), jnp.float32)
    for dy in range(ky):
        for dx in range(kxf):
            acc = acc + jax.lax.dot_general(
                xp[dy:dy + bh, dx:dx + wf], k[dy, dx], dn,
                preferred_element_type=jnp.float32)
    out_ref[0] = acc.astype(out_ref.dtype)


def _pad_to(n: int, m: int) -> int:
    return -(-n // m) * m


def _footprint(bh: int, wf: int, cif: int, cof: int, ky: int) -> int:
    """Scoped-VMEM model for one program: 3 input blocks + padded concat +
    per-dy materialized tap slices + dot temps (14 input-block-sized bf16
    buffers at ky=3, matched against compile-time OOM dumps; the tap-copy
    term scales with ky) + two fp32 accumulator-sized buffers + the folded
    weight.

    Buffers are modeled at their TILE-PADDED sizes: blocks are [.., wf,
    c] with c on lanes (pads to 128) and wf on sublanes (bf16 packs two
    sublanes per 32-bit word -> 16-row tiles; fp32 pads to 8).  Without
    this, a cif=64 fold (e.g. w=136 at the 768x1088 bucket's stage-1 vis
    conv, where only f=4 gives an even folded width) doubles every real
    buffer vs the model and Mosaic stack-OOMs at 25.7M vs the 16M scoped
    limit while the model claims 7.6M."""
    in_block = bh * _pad_to(wf, 16) * _pad_to(cif, 128) * 2
    acc = bh * _pad_to(wf, 8) * _pad_to(cof, 128) * 4
    return ((5 + 3 * ky) * in_block + 2 * acc
            + ky * 3 * _pad_to(cif, 16) * _pad_to(cof, 128) * 2)


def _bh_for(h: int, wf: int, cif: int, cof: int, ky: int,
            cap_bytes: int = 10 << 20) -> int:
    """Largest row-block height (multiple of 8 dividing h) whose modeled
    footprint fits; 0 when even 8 rows do not (callers must fall back)."""
    best = 0
    for cand in range(8, min(h, 256) + 1, 8):
        if h % cand == 0 and _footprint(cand, wf, cif, cof, ky) <= cap_bytes:
            best = cand
    return best


def _fold_factor(w: int, ci: int, co: int, kx: int = 3) -> int:
    """Fold enough W-pixels for ~128 input lanes, but cap the folded
    OUTPUT width (f*co > 512 blows the weight/accumulator VMEM for
    extreme ci:co ratios) and keep f >= (kx-1)//2 (the 3-folded-tap
    representability bound) and f | w.

    The folded width W/f must be EVEN: Mosaic lowers the kernel's rank-3
    dot by flattening [BH, W', Ci'] -> [BH*W', Ci'], and for bf16's (2, 1)
    sublane packing that shape cast is unsupported at odd W' (measured:
    wf=5 'infer-vector-layout: unsupported shape cast' at the train-crop
    stage-2 vis conv [128, 160, 1->16], while wf 4/10/12/20/48 all
    compile)."""
    p = (kx - 1) // 2
    cap = max(1, min(128 // max(ci, 1), 512 // max(co, 1)))
    for f in range(cap, 0, -1):
        if w % f == 0 and f >= p and (w // f) % 2 == 0:
            return f
    # no even-width fold >= p divides w: f=1 is only legal for kx <= 3
    # (pxf == p) and even w; larger kernels would need the unfolded kx-tap
    # path whose narrow-lane VMEM padding the footprint model does not
    # cover
    return 1 if (p <= 1 and w % 2 == 0) else 0


def conv2d_viable(h: int, w: int, ci: int, co: int, ky: int = 3,
                  kx: int = 3) -> bool:
    """Can conv2d_p run this shape within the VMEM/halo model?"""
    if h % 8 or h < 8 or ci < 1 or ky % 2 == 0 or kx % 2 == 0:
        return False
    if (ky - 1) // 2 > 8:
        return False  # y-halo comes from one 8-row spec per side
    f = _fold_factor(w, ci, co, kx)
    if f == 0:
        return False
    return _bh_for(h, w // f, f * ci, f * co, ky) > 0


def conv3x3_viable(h: int, w: int, ci: int, co: int) -> bool:
    return conv2d_viable(h, w, ci, co, 3, 3)


def _conv2d_fwd_impl(x: Array, kernel: Array) -> Array:
    b, h, w, ci = x.shape
    ky, kx, _, co = kernel.shape
    f = _fold_factor(w, ci, co, kx)
    assert f > 0, ("conv2d_p gated by conv2d_viable", x.shape, kernel.shape)
    wf, cif, cof = w // f, f * ci, f * co
    xf = x.reshape(b, h, wf, cif)            # free: channels-last W-fold
    if f > 1:
        kf, kxf = fold_w_kernel(kernel, f), 3
    else:
        kf, kxf = kernel, kx
    bh = _bh_for(h, wf, cif, cof, ky)
    assert bh > 0, ("conv2d_p gated by conv2d_viable", x.shape, co)
    nblocks = h // bh
    out = pl.pallas_call(
        functools.partial(_kernel, bh=bh, wf=wf, cif=cif, cof=cof,
                          nblocks=nblocks, ky=ky, kxf=kxf),
        grid=(b, nblocks),
        in_specs=[
            pl.BlockSpec((1, 8, wf, cif),
                         lambda bi, i: (bi, jnp.maximum(i * (bh // 8) - 1, 0),
                                        0, 0)),
            pl.BlockSpec((1, bh, wf, cif), lambda bi, i: (bi, i, 0, 0)),
            pl.BlockSpec((1, 8, wf, cif),
                         lambda bi, i: (bi, jnp.minimum(i * (bh // 8) + bh // 8,
                                                        h // 8 - 1), 0, 0)),
            pl.BlockSpec((ky, kxf, cif, cof), lambda bi, i: (0, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bh, wf, cof), lambda bi, i: (bi, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, wf, cof), x.dtype),
        interpret=_interpret(),
    )(xf, xf, xf, kf)
    return out.reshape(b, h, w, co)


@jax.custom_vjp
def conv2d_p(x: Array, kernel: Array) -> Array:
    """Odd-k stride-1 'same' (torch zero-pad) conv, Pallas-fused.

    x: [B, H, W, Ci] (H % 8 == 0); kernel: [ky, kx, Ci, Co], ky/kx odd,
    (ky-1)//2 <= 8. Gate call sites with conv2d_viable."""
    return _conv2d_fwd_impl(x, kernel)


def _conv2d_fwd(x, kernel):
    return _conv2d_fwd_impl(x, kernel), (x, kernel)


def _conv2d_bwd(res, g):
    x, kernel = res
    ky, kx = kernel.shape[0], kernel.shape[1]
    # dX: stride-1 'same' conv transpose == same conv with the spatially
    # flipped kernel and ci/co swapped
    kt = jnp.flip(kernel, axis=(0, 1)).transpose(0, 1, 3, 2)
    dx = _conv2d_fwd_impl(g.astype(x.dtype), kt.astype(kernel.dtype))
    # dK[dy, dx, ci, co] = sum_pixels x_shifted[.., ci] * g[.., co]
    b, h, w, ci = x.shape
    py, px = (ky - 1) // 2, (kx - 1) // 2
    xp = jnp.pad(x.astype(jnp.float32),
                 ((0, 0), (py, py), (px, px), (0, 0)))
    gf = g.astype(jnp.float32)
    taps = []
    for dy in range(ky):
        row = []
        for dxx in range(kx):
            t = jax.lax.slice(xp, (0, dy, dxx, 0), (b, dy + h, dxx + w, ci))
            row.append(jnp.einsum("bhwc,bhwo->co", t, gf))
        taps.append(jnp.stack(row))
    dk = jnp.stack(taps).astype(kernel.dtype)
    return dx, dk


conv2d_p.defvjp(_conv2d_fwd, _conv2d_bwd)

# 3x3 alias (the original kernel's public name; same code path)
conv3x3_p = conv2d_p
