"""Banded-matmul plane-sweep warp: the MXU formulation of grid_sample.

The gather formulations (ops/pallas/warp_blend.py + grid_sample.py) are
index-bound: XLA gathers cost ~12-36 ns per index regardless of slice width,
so even the depth-folded y-grouped path pays ~0.22M-3.5M indices per source
view at DTU eval scale (the r3 profile: 288 ms of eval, and the training
backward's per-sample scatter transpose runs at 1 GB/s, ~270 ms/step).

This module reformulates the warp as dense linear algebra
(docs/warp_kernel_design.md "banded-matmul formulation"):

- For a group of gy consecutive output rows (x one (b, hg[, d]) band), ALL
  samples live in a [ky]-row horizontal BAND of the source image. Fetching
  the band is ONE full-minor gather index per group (stage 4 DTU eval: 576
  indices/view vs 0.22M) — gathers of contiguous [ky, C*W] slabs run at
  memory bandwidth.
- Inside the kernel, the x-selection `band[:, ux0(x)]` is a matmul with an
  EXACT bf16 one-hot matrix built from an iota comparison: bf16 holds 0/1
  exactly, so `band @ onehot(ux0)` equals the gather bit-for-bit, and it
  runs on the MXU instead of the scatter/gather units. Two one-hot matmuls
  (ux0, ux0+1) feed an fp32 epilogue that applies the bilinear x-fraction,
  then the y-lerp selects 2 of the ky band rows per pixel with fp32 masked
  MACs over static sublane slices (the warp_blend kernel's pattern).
- The VJP is the transposed matmuls (dband = onehot @ drv — MXU again) plus
  ky native row scatter-adds of whole bands back into the image
  (grid_sample._gather_patches_bwd's pattern, but with thousands of indices
  instead of millions): the training step's pathological scatter class
  disappears entirely.

Exactness: bit-identical to grid_sample(zeros, align_corners=True) per-sample
sampling wherever the sample's 2x2 corner footprint lies inside the band
window (ky rows anchored at the group min, the same guarantee class as the
y-grouped path: |dv/dy| <= (ky-2)/(gy-1)); out-of-window corners blend to
zero, the out-of-FOV class. The x axis has NO window in this formulation —
the matmul contracts over the full source width — so the y-grouped path's
wx escapes do not exist here.

Layouts (all natural, no relayouts on either side of the pallas_call):
  bands  [NB, ky*C, W]   bf16/f32 — [ky, C] on sublanes, W on lanes
  x/dyr/fy [ROWS, 1, W]  f32 — per-output-pixel source-x, row offset in the
                          band (y0 - ay), and y fraction
  out    [C, ROWS, W]    f32 — natural (b, d, h) row order
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

Array = jax.Array


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _bx_for(w: int, cap: int = 512) -> int:
    """Largest 128-multiple divisor of w (<= cap); whole-W when none."""
    for cand in range(min(cap, w) // 128 * 128, 0, -128):
        if w % cand == 0:
            return cand
    return w


def _fwd_kernel(band_ref, x_ref, dyr_ref, fy_ref, out_ref,
                *, c: int, ky: int, w: int):
    """One (band, row, x-block) program.

    band_ref [1, ky*C, W]; x_ref/dyr_ref/fy_ref [1, 1, BX];
    out_ref [C, 1, BX].
    """
    band = band_ref[0]                      # [ky*C, W]
    x = x_ref[0]                            # [1, BX] f32 source-x coords
    x0 = jnp.floor(x)
    fx = x - x0

    # exact one-hot selectors: iota over the source width (sublanes) vs the
    # per-output-pixel floor coordinate (lanes). 0/1 are exact in bf16, so
    # the MXU contraction reproduces the gather bit-for-bit; coordinates
    # outside [0, W) simply never match (zeros padding semantics).
    # Mosaic's tpu.iota is integer-only; compare in int32 (x0 is an exact
    # integer float; |x0| beyond int32 range cannot match iota < W anyway).
    x0i = x0.astype(jnp.int32)
    iota_u = jax.lax.broadcasted_iota(jnp.int32, (w, x.shape[-1]), 0)
    a0 = (iota_u == x0i).astype(band.dtype)        # [W, BX]
    a1 = (iota_u == (x0i + 1)).astype(band.dtype)

    rv0 = jax.lax.dot(band, a0, preferred_element_type=jnp.float32)
    rv1 = jax.lax.dot(band, a1, preferred_element_type=jnp.float32)
    rv = rv0 * (1.0 - fx) + rv1 * fx        # [ky*C, BX] f32

    dyr = dyr_ref[0]                        # [1, BX]
    fy = fy_ref[0]
    acc = jnp.zeros((c, rv.shape[-1]), jnp.float32)
    for k in range(ky):
        wy = jnp.where(dyr == k, 1.0 - fy, jnp.where(dyr == k - 1, fy, 0.0))
        acc = acc + rv[k * c:(k + 1) * c, :] * wy
    out_ref[:] = acc[:, None, None, :]


def _bwd_kernel(g_ref, x_ref, dyr_ref, fy_ref, dband_ref,
                *, c: int, ky: int, w: int, steps_per_band: int):
    """Transpose of _fwd_kernel: dband [1, ky*C, W] accumulated over the
    steps_per_band grid steps that share one band (rows x x-blocks [x d])."""
    x = x_ref[0]
    x0 = jnp.floor(x)
    fx = x - x0
    dyr = dyr_ref[0]
    fy = fy_ref[0]
    g = g_ref[:, 0, 0, :]                   # [C, BX] f32

    # d rv[k*C:(k+1)*C] = g * wy_k  (the y-lerp transpose)
    drv_rows = []
    for k in range(ky):
        wy = jnp.where(dyr == k, 1.0 - fy, jnp.where(dyr == k - 1, fy, 0.0))
        drv_rows.append(g * wy)
    drv = jnp.concatenate(drv_rows, axis=0)  # [ky*C, BX]

    x0i = x0.astype(jnp.int32)
    iota_u = jax.lax.broadcasted_iota(jnp.int32, (w, x.shape[-1]), 0)
    a0 = (iota_u == x0i).astype(jnp.float32)
    a1 = (iota_u == (x0i + 1)).astype(jnp.float32)
    # dband = drv0 @ a0^T + drv1 @ a1^T, contracting the BX axis
    dn = (((1,), (1,)), ((), ()))
    contrib = (
        jax.lax.dot_general(drv * (1.0 - fx), a0, dn,
                            preferred_element_type=jnp.float32)
        + jax.lax.dot_general(drv * fx, a1, dn,
                              preferred_element_type=jnp.float32)
    )  # [ky*C, W]

    first = pl.program_id(1) == 0

    @pl.when(first)
    def _init():
        dband_ref[0] = contrib

    @pl.when(jnp.logical_not(first))
    def _acc():
        dband_ref[0] = dband_ref[0] + contrib


def banded_warp_rows(bands: Array, x_src: Array, dyr: Array, fy: Array,
                     c: int, gy: int, ky: int, w: int,
                     d_shared: int = 1, row_map=None) -> Array:
    """Blend banded samples: bands [NB, ky*C, W] -> out [C, ROWS, W] f32.

    x_src/dyr/fy: [ROWS, 1, W] f32 where ROWS = NB * gy * d_shared. Band i
    serves rows row_map(i, r) for r in [0, gy*d_shared); the default map is
    r-major contiguous (i*per_band + r). The depth-FOLDED caller passes a map
    that scatters a band's rows into natural (b, d, h) order so no transpose
    is needed on either side. The grid iterates r innermost, so the band
    block stays VMEM-resident across its gy*d_shared * (W/BX) steps.
    """
    nb = bands.shape[0]
    rows = x_src.shape[0]
    per_band = gy * d_shared
    assert rows == nb * per_band, (rows, nb, per_band)
    assert bands.shape[1:] == (ky * c, w), bands.shape
    bx = _bx_for(w)
    nj = w // bx
    rmap = row_map or (lambda i, r: i * per_band + r)
    wspec = pl.BlockSpec((1, 1, bx), lambda i, r, j: (rmap(i, r), 0, j))

    # the output carries a singleton axis so the block's LAST TWO dims are
    # (1 == array dim, bx): Mosaic requires the trailing two block dims to be
    # (8, 128)-divisible or span the array — (C, 1, BX) would violate that
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, c=c, ky=ky, w=w),
        grid=(nb, per_band, nj),
        in_specs=[pl.BlockSpec((1, ky * c, w), lambda i, r, j: (i, 0, 0)),
                  wspec, wspec, wspec],
        out_specs=pl.BlockSpec((c, 1, 1, bx),
                               lambda i, r, j: (0, rmap(i, r), 0, j)),
        out_shape=jax.ShapeDtypeStruct((c, rows, 1, w), jnp.float32),
        interpret=_interpret(),
    )(bands, x_src, dyr, fy)
    return out.reshape(c, rows, w)


def banded_warp_rows_bwd(g: Array, x_src: Array, dyr: Array, fy: Array,
                         c: int, gy: int, ky: int, w: int,
                         d_shared: int = 1, row_map=None,
                         band_dtype=jnp.float32) -> Array:
    """dbands [NB, ky*C, W] from dout g [C, ROWS, W] — the matmul transpose
    of banded_warp_rows, accumulated across each band's grid steps."""
    rows = x_src.shape[0]
    per_band = gy * d_shared
    nb = rows // per_band
    bx = _bx_for(w)
    nj = w // bx
    rmap = row_map or (lambda i, r: i * per_band + r)
    wspec = pl.BlockSpec((1, 1, bx),
                         lambda i, s: (rmap(i, s // nj), 0, s % nj))

    dbands = pl.pallas_call(
        functools.partial(_bwd_kernel, c=c, ky=ky, w=w,
                          steps_per_band=per_band * nj),
        grid=(nb, per_band * nj),
        in_specs=[
            pl.BlockSpec((c, 1, 1, bx),
                         lambda i, s: (0, rmap(i, s // nj), 0, s % nj)),
            wspec, wspec, wspec,
        ],
        out_specs=pl.BlockSpec((1, ky * c, w), lambda i, s: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nb, ky * c, w), jnp.float32),
        interpret=_interpret(),
    )(g.astype(jnp.float32).reshape(g.shape[0], rows, 1, w),
      x_src, dyr, fy)
    return dbands.astype(band_dtype)
