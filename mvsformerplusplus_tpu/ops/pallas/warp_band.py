"""Banded-matmul plane-sweep warp: the MXU formulation of grid_sample.

The gather formulations (ops/pallas/warp_blend.py + grid_sample.py) are
index-bound: XLA gathers cost ~12-36 ns per index regardless of slice width,
so even the depth-folded y-grouped path pays ~0.22M-3.5M indices per source
view at DTU eval scale (r3 profile: 288 ms of eval; the training backward's
per-sample scatter transpose runs at 1 GB/s, ~270 ms/step).

This module reformulates the warp as dense linear algebra
(docs/warp_kernel_design.md "banded-matmul formulation"):

- For a group of gy consecutive output rows (x one (b, d, hg) band — or one
  (b, hg) band shared across all D when depth-folded), ALL samples live in a
  [ky]-row horizontal BAND of the source image. Fetching a band is ONE
  full-minor gather index (stage 4 DTU eval: 576/view vs 0.22M) — contiguous
  [ky, C*W] slabs move at memory bandwidth.
- In-kernel, the x-selection `band[:, ux0(x)]` is a matmul against an EXACT
  bf16 one-hot built from an integer-iota comparison: bf16 holds 0/1
  exactly, so `band @ onehot(ux0)` equals the gather bit-for-bit and runs on
  the MXU. Two one-hot matmuls (ux0, ux0+1) feed an fp32 epilogue that
  applies the bilinear x-fraction; the y-lerp then selects 2 of the ky band
  rows per pixel with fp32 masked MACs over static sublane slices.
- The contraction is WINDOWED when the row is wide: the kernel reduces over
  a [BU]-column slice of the band anchored at the row-block's min source
  column (128-aligned ref-level dynamic slice) instead of the full width —
  at stage-4 DTU eval this cuts both matmul FLOPs and one-hot build cost
  ~3x. Samples whose footprint escapes the window blend to zero (the
  out-of-FOV class; plane-sweep u(x) has slope ~1, so a BX+2*128 window has
  headroom of ~2 blocks of disparity drift within one x-block).
- One program serves ALL gy rows of its (band, depth, x-block) — the v1
  one-row-per-program layout was grid-overhead-bound (measured: stage-1
  build_volume flat at ~64 ms regardless of variant).
- The VJP is the transposed matmuls (dband = drv @ onehot^T — MXU again,
  full-width: training crops are narrow) plus ky native row scatter-adds of
  whole bands into the image (one index per band): the training step's
  pathological scatter class disappears entirely.

Layouts (all natural, no relayouts on either side of the pallas_call):
  bands    [NB, ky*C, W]        bf16/f32 — [ky, C] on sublanes, W on lanes
  x/dyr/fy [NBROWS, gy, W]      f32 — source-x, band row offset (y0 - ay),
                                 y fraction, rows ordered (b, d, hg)
  out      [C, NBROWS, gy, W]   f32 — reshapes freely to [C, B*D*H, W]
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _bx_for(w: int, cap: int = 512) -> int:
    """Largest 128-multiple divisor of w (<= cap); whole-W when none."""
    for cand in range(min(cap, w) // 128 * 128, 0, -128):
        if w % cand == 0:
            return cand
    return w


def _row_window(x0i, w: int, bu: int):
    """128-aligned window start covering the row-block's min source column."""
    lo = jnp.min(jnp.clip(x0i, -1, w - 1))
    cu0 = jnp.clip((lo // 128) * 128, 0, w - bu)
    return pl.multiple_of(cu0, 128)


def _row_window_robust(x0i, w: int, bu: int):
    """Like _row_window but diverged/out-of-image samples cannot pin the
    anchor (they get zero weight/gradient regardless, so they need no
    window coverage)."""
    lo = jnp.min(jnp.where((x0i >= -1) & (x0i <= w - 1), x0i, jnp.int32(w)))
    cu0 = jnp.clip((lo // 128) * 128, 0, w - bu)
    return pl.multiple_of(cu0, 128)


def _fwd_kernel(band_ref, x_ref, dyr_ref, fy_ref, out_ref,
                *, c: int, gy: int, ky: int, w: int, bu: int):
    """One (band, depth, x-block) program covering gy output rows.

    band_ref [1, ky*C, W]; x/dyr/fy refs [1, gy, BX]; out_ref [C, 1, gy, BX].
    """
    x = x_ref[0]                            # [gy, BX] f32
    dyr = dyr_ref[0]
    fy = fy_ref[0]
    bx = x.shape[-1]

    x0 = jnp.floor(x)
    fx_all = x - x0
    x0i_all = x0.astype(jnp.int32)
    # window + iota hoisted out of the row loop: one VMEM band slice and one
    # iota per PROGRAM (the gy rows' source columns are near-identical, so a
    # shared 128-aligned window covers them with the same escape class)
    if bu < w:
        cu0 = _row_window(x0i_all, w, bu)
        bandw = band_ref[0, :, pl.ds(cu0, bu)]       # [ky*C, BU]
        x0i_all = x0i_all - cu0
    else:
        bandw = band_ref[0]
    iota_u = jax.lax.broadcasted_iota(jnp.int32, (bu, bx), 0)

    rows = []
    for r in range(gy):
        diff = iota_u - x0i_all[r:r + 1]
        a0 = (diff == 0).astype(bandw.dtype)         # exact 0/1 in bf16
        a1 = (diff == 1).astype(bandw.dtype)
        rv0 = jax.lax.dot(bandw, a0, preferred_element_type=jnp.float32)
        rv1 = jax.lax.dot(bandw, a1, preferred_element_type=jnp.float32)
        fx = fx_all[r:r + 1]
        rv = rv0 * (1.0 - fx) + rv1 * fx             # [ky*C, BX] f32

        dyr_r = dyr[r:r + 1]
        fy_r = fy[r:r + 1]
        acc = jnp.zeros((c, bx), jnp.float32)
        for k in range(ky):
            wy = jnp.where(dyr_r == k, 1.0 - fy_r,
                           jnp.where(dyr_r == k - 1, fy_r, 0.0))
            acc = acc + rv[k * c:(k + 1) * c, :] * wy
        rows.append(acc)
    out_ref[:, 0] = jnp.stack(rows, axis=1)          # [C, gy, BX]


def _bwd_kernel(g_ref, x_ref, dyr_ref, fy_ref, dband_ref,
                *, c: int, gy: int, ky: int, w: int, bu: int):
    """Transpose of _fwd_kernel: dband [1, ky*C, W] accumulated across the
    (depth, x-block) grid steps sharing one band. The contraction is
    WINDOWED like the forward's (dband columns outside the row-block's
    128-aligned [BU] window get zero gradient — exactly the samples the
    windowed forward zeroes), cutting the transposed matmuls' output tiles
    W/BU-fold (train 512x640 stage4: 5 -> 3 column tiles)."""
    x = x_ref[0]
    dyr = dyr_ref[0]
    fy = fy_ref[0]
    bx = x.shape[-1]

    first = pl.program_id(1) == 0

    @pl.when(first)
    def _init():
        dband_ref[0] = jnp.zeros_like(dband_ref[0])

    x0_all = jnp.floor(x)
    x0i_all = x0_all.astype(jnp.int32)
    if bu < w:
        cu0 = _row_window_robust(x0i_all, w, bu)
        x0i_all = x0i_all - cu0
    else:
        cu0 = 0
    iota_u = jax.lax.broadcasted_iota(jnp.int32, (bu, bx), 0)

    contrib = jnp.zeros((ky * c, bu), jnp.float32)
    for r in range(gy):
        x0i = x0i_all[r:r + 1]
        fx = x[r:r + 1] - x0_all[r:r + 1]
        diff = iota_u - x0i
        a0 = (diff == 0).astype(jnp.float32)
        a1 = (diff == 1).astype(jnp.float32)

        g = g_ref[:, 0, r, :]               # [C, BX] f32
        dyr_r = dyr[r:r + 1]
        fy_r = fy[r:r + 1]
        drv_rows = []
        for k in range(ky):
            wy = jnp.where(dyr_r == k, 1.0 - fy_r,
                           jnp.where(dyr_r == k - 1, fy_r, 0.0))
            drv_rows.append(g * wy)
        drv = jnp.concatenate(drv_rows, axis=0)      # [ky*C, BX]
        dn = (((1,), (1,)), ((), ()))
        contrib = contrib + jax.lax.dot_general(
            drv * (1.0 - fx), a0, dn, preferred_element_type=jnp.float32)
        contrib = contrib + jax.lax.dot_general(
            drv * fx, a1, dn, preferred_element_type=jnp.float32)

    if bu < w:
        cur = dband_ref[0, :, pl.ds(cu0, bu)]
        dband_ref[0, :, pl.ds(cu0, bu)] = cur + contrib
    else:
        dband_ref[0] = dband_ref[0] + contrib


def _rg_map(d_shared: int, hg: int):
    """Band i = (b, hg), depth dd -> row-group index in (b, d, hg) order."""
    if d_shared == 1:
        return lambda i, dd: i
    return lambda i, dd: (i // hg) * (d_shared * hg) + dd * hg + (i % hg)


def banded_warp_rows(bands: Array, x_src: Array, dyr: Array, fy: Array,
                     c: int, gy: int, ky: int, w: int,
                     d_shared: int = 1, hg: int = 1,
                     bu: int = 0) -> Array:
    """Blend banded samples: bands [NB, ky*C, W] -> out [C, NBROWS, gy, W].

    x_src/dyr/fy: [NBROWS, gy, W] f32, row-groups ordered (b, d, hg) — so the
    output reshapes freely to [C, B*D*H, W]. When d_shared > 1 (depth-folded
    bands), band i=(b, hg) serves the d_shared row-groups given by hg.
    bu: contraction window (0 -> min(w, bx + 256), rounded to 128).
    """
    nb = bands.shape[0]
    nbrows = x_src.shape[0]
    assert nbrows == nb * d_shared, (nbrows, nb, d_shared)
    assert bands.shape[1:] == (ky * c, w), bands.shape
    bx = _bx_for(w)
    nj = w // bx
    if bu <= 0:
        bu = min(w, bx + 256)
    bu = min(w, -(-bu // 128) * 128)
    rg = _rg_map(d_shared, hg)
    wspec = pl.BlockSpec((1, gy, bx), lambda i, dd, j: (rg(i, dd), 0, j))

    out = pl.pallas_call(
        functools.partial(_fwd_kernel, c=c, gy=gy, ky=ky, w=w, bu=bu),
        grid=(nb, d_shared, nj),
        in_specs=[pl.BlockSpec((1, ky * c, w), lambda i, dd, j: (i, 0, 0)),
                  wspec, wspec, wspec],
        out_specs=pl.BlockSpec((c, 1, gy, bx),
                               lambda i, dd, j: (0, rg(i, dd), 0, j)),
        out_shape=jax.ShapeDtypeStruct((c, nbrows, gy, w), jnp.float32),
        interpret=_interpret(),
    )(bands, x_src, dyr, fy)
    return out


def banded_warp_rows_bwd(g: Array, x_src: Array, dyr: Array, fy: Array,
                         c: int, gy: int, ky: int, w: int,
                         d_shared: int = 1, hg: int = 1,
                         band_dtype=jnp.float32, bu: int = 0) -> Array:
    """dbands [NB, ky*C, W] from dout g [C, NBROWS, gy, W].

    bu: contraction window (0 -> min(w, bx + 256), rounded to 128; same
    economics as the forward's window)."""
    nbrows = x_src.shape[0]
    nb = nbrows // d_shared
    bx = _bx_for(w)
    nj = w // bx
    if bu <= 0:
        bu = min(w, bx + 256)
    bu = min(w, -(-bu // 128) * 128)
    rg = _rg_map(d_shared, hg)
    wspec = pl.BlockSpec((1, gy, bx),
                         lambda i, s: (rg(i, s // nj), 0, s % nj))

    dbands = pl.pallas_call(
        functools.partial(_bwd_kernel, c=c, gy=gy, ky=ky, w=w, bu=bu),
        grid=(nb, d_shared * nj),
        in_specs=[
            pl.BlockSpec((c, 1, gy, bx),
                         lambda i, s: (0, rg(i, s // nj), 0, s % nj)),
            wspec, wspec, wspec,
        ],
        out_specs=pl.BlockSpec((1, ky * c, w), lambda i, s: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nb, ky * c, w), jnp.float32),
        interpret=_interpret(),
    )(g.astype(jnp.float32), x_src, dyr, fy)
    return dbands.astype(band_dtype)


def _fwd_kernel_blocked(bands_ref, x_ref, dyr_ref, fy_ref, out_ref,
                        *, c: int, gy: int, ky: int, jb: int, bw: int):
    """Per-(row-group, x-superblock) program: jb 128-px blocks, each with
    its OWN [ky*C, BW=256] band (anchored per block — whole-row bands are
    unsound under epipolar tilt: in-image v spans up to 80 rows across a
    stage-4 DTU row vs <= 14.4 within any 128-px block).

    bands_ref [JB, ky*C, BW]; x/dyr/fy refs [1, gy, JB*128] (x is RELATIVE
    to the block's column anchor); out_ref [C, 1, gy, JB*128].
    """
    x = x_ref[0]
    dyr = dyr_ref[0]
    fy = fy_ref[0]

    nch = bw // 128
    cols = []
    for j in range(jb):
        band = bands_ref[j]                       # [ky*C, BW]
        chunks = [band[:, ch * 128:(ch + 1) * 128] for ch in range(nch)]
        sl = slice(j * 128, (j + 1) * 128)
        cols.append(_blend_block(chunks, x[:, sl], dyr[:, sl], fy[:, sl],
                                 c, gy, ky))
    out_ref[:, 0] = jnp.concatenate(cols, axis=2)  # [C, gy, JB*128]


def _blend_block(chunks, x_block, dyr_block, fy_block,
                 c: int, gy: int, ky: int):
    """Shared per-(128-px block) blend: window-column CHUNKS (list of
    [ky*C, 128] slabs in column order) + RELATIVE x/dyr/fy [gy, 128] ->
    [C, gy, 128] f32.

    ONE wide matmul per chunk: all gy rows' (ux0, ux0+1) one-hot selectors
    pack along the OUTPUT columns ([128, gy*2*128]), so the MXU pipelines
    gy*2 column tiles per dot instead of issuing gy*2 latency-bound
    [ky*C, 128] @ [128, 128] matmuls (the v1 per-row form measured
    ~66 us/program at stage-4 DTU eval — ~6x its pass-count floor; the
    per-128-chunk contraction keeps the fused-DMA slab layout feedable
    with sublane-side reshapes either way)."""
    x0 = jnp.floor(x_block)
    fx_all = x_block - x0
    x0i = x0.astype(jnp.int32)
    # wide selector targets, ordered (row, which) on lanes:
    # column j of the wide output = (r = j//256, which = (j//128) % 2)
    y_w = jnp.stack([x0i, x0i + 1], axis=1).reshape(1, gy * 2 * 128)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (128, gy * 2 * 128), 0)
    rv_w = None
    for ch, band_ch in enumerate(chunks):
        aw = ((iota_w + ch * 128) == y_w).astype(band_ch.dtype)
        p = jax.lax.dot(band_ch, aw, preferred_element_type=jnp.float32)
        rv_w = p if rv_w is None else rv_w + p    # [ky*C, gy*2*128]
    rows = []
    for r in range(gy):
        rv0 = rv_w[:, r * 256:r * 256 + 128]
        rv1 = rv_w[:, r * 256 + 128:r * 256 + 256]
        fx = fx_all[r:r + 1]
        rv = rv0 * (1.0 - fx) + rv1 * fx          # [ky*C, 128]
        dyr_r = dyr_block[r:r + 1]
        fy_r = fy_block[r:r + 1]
        acc = jnp.zeros((c, 128), jnp.float32)
        for k in range(ky):
            wy = jnp.where(dyr_r == k, 1.0 - fy_r,
                           jnp.where(dyr_r == k - 1, fy_r, 0.0))
            acc = acc + rv[k * c:(k + 1) * c, :] * wy
        rows.append(acc)
    return jnp.stack(rows, axis=1)                # [C, gy, 128]


def _fwd_kernel_fused(starts_ref, x_ref, dyr_ref, fy_ref, img_ref, out_ref,
                      slab, sems, *, c: int, gy: int, ky: int, jb: int,
                      bw: int, npb: int, nj: int, total: int):
    """Fused-DMA blocked banded warp: one program per (row-group,
    x-superblock of jb 128-px blocks). Band slabs are DMA'd STRAIGHT from
    the source image in HBM at the scalar-prefetched (b, row, chunk)
    offsets — the [NB, ky*C, BW] band tensor of the gather formulation
    never exists (its HBM write + read-back tripled band traffic). Double
    buffered: program i+1's slabs stream in while i computes.

    starts_ref (SMEM prefetch): [3, NB_total] int32 of (b, row, chunk)
    COMPONENT-MAJOR — a [NB, 3] layout pads the minor dim in SMEM and
    blows the 1 MB budget at stage-3/4 scale (measured: 3.5 MB ask);
    img_ref: [B, H, W/128, C, 128] in HBM (ANY) — the chunk dim sits
    OUTSIDE the tiled (C, 128) minor pair so a 3-chunk dynamic slice is
    legal (slicing a sublane-tiled chunk dim needs 8-alignment, which a
    3-chunk window can't give); slab VMEM scratch [2, jb, ky, 3, C, 128];
    sems: DMA sems [2, jb].
    """
    step = pl.program_id(0)
    slot = jax.lax.rem(step, 2)

    def dma(s, the_step, j):
        i = the_step // npb
        jblk = jax.lax.rem(the_step, npb)
        base = i * nj + jblk * jb + j
        b = starts_ref[0, base]
        row = starts_ref[1, base]
        k0 = starts_ref[2, base]
        return pltpu.make_async_copy(
            img_ref.at[b, pl.ds(row, ky), pl.ds(k0, 3), :, :],
            slab.at[s, j],
            sems.at[s, j],
        )

    @pl.when(step == 0)
    def _warmup():
        for j in range(jb):
            dma(0, step, j).start()

    @pl.when(step + 1 < total)
    def _prefetch_next():
        nxt = jax.lax.rem(step + 1, 2)
        for j in range(jb):
            dma(nxt, step + 1, j).start()

    x = x_ref[0]
    dyr = dyr_ref[0]
    fy = fy_ref[0]

    nch = bw // 128
    cols = []
    for j in range(jb):
        dma(slot, step, j).wait()
        # [ky, C, 128] per chunk -> [ky*C, 128]: sublane-side merge only
        chunks = [slab[slot, j, :, ch, :, :].reshape(ky * c, 128)
                  for ch in range(nch)]
        sl = slice(j * 128, (j + 1) * 128)
        cols.append(_blend_block(chunks, x[:, sl], dyr[:, sl], fy[:, sl],
                                 c, gy, ky))
    out_ref[:, 0] = jnp.concatenate(cols, axis=2)  # [C, gy, JB*128]


def banded_warp_blocked_fused(img_b5: Array, starts: Array, x_rel: Array,
                              dyr: Array, fy: Array, c: int, gy: int,
                              ky: int, w: int, bw: int = 384) -> Array:
    """Fused-DMA variant of banded_warp_blocked: takes the [B, H, W/128, C,
    128] image + flat starts [3, NB_total] (b, row, chunk) instead of
    materialized bands. Same math, same output [C, NBROWS, gy, W] f32."""
    nbrows = x_rel.shape[0]
    nj = w // 128
    assert starts.shape == (3, nbrows * nj), (starts.shape, nbrows, nj)
    jb = 1
    for cand in (8, 6, 4, 3, 2):
        if nj % cand == 0 and 2 * cand * ky * c * bw * 2 <= (3 << 20):
            jb = cand
            break
    npb = nj // jb
    total = nbrows * npb
    wspec = pl.BlockSpec((1, gy, jb * 128),
                         lambda s, starts_ref: (s // npb, 0,
                                                jax.lax.rem(s, npb)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(total,),
        in_specs=[wspec, wspec, wspec,
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (c, 1, gy, jb * 128),
            lambda s, starts_ref: (0, s // npb, 0, jax.lax.rem(s, npb))),
        scratch_shapes=[
            pltpu.VMEM((2, jb, ky, 3, c, 128), img_b5.dtype),
            pltpu.SemaphoreType.DMA((2, jb)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_fwd_kernel_fused, c=c, gy=gy, ky=ky, jb=jb,
                          bw=bw, npb=npb, nj=nj, total=total),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((c, nbrows, gy, w), jnp.float32),
        interpret=_interpret(),
    )(starts, x_rel, dyr, fy, img_b5)
    return out


def _bwd_kernel_blocked(g_ref, x_ref, dyr_ref, fy_ref, dbands_ref,
                        *, c: int, gy: int, ky: int, jb: int, bw: int):
    """Transpose of _fwd_kernel_blocked: one program per (row-group,
    x-superblock) emits jb per-block dband slabs [ky*C, BW] (x RELATIVE to
    each block's column anchor, same prep as the forward). No cross-program
    accumulation: each (row-group, block) owns its slab; overlapping source
    windows are reconciled by the caller's scatter-add."""
    x = x_ref[0]
    dyr = dyr_ref[0]
    fy = fy_ref[0]
    iota_u = jax.lax.broadcasted_iota(jnp.int32, (bw, 128), 0)

    for j in range(jb):
        sl = slice(j * 128, (j + 1) * 128)
        x0 = jnp.floor(x[:, sl])
        fx_all = x[:, sl] - x0
        x0i = x0.astype(jnp.int32)
        contrib = jnp.zeros((ky * c, bw), jnp.float32)
        for r in range(gy):
            diff = iota_u - x0i[r:r + 1]
            a0 = (diff == 0).astype(jnp.float32)      # [BW, 128]
            a1 = (diff == 1).astype(jnp.float32)
            g = g_ref[:, 0, r, sl]                    # [C, 128] f32
            dyr_r = dyr[r:r + 1, sl]
            fy_r = fy[r:r + 1, sl]
            drv_rows = []
            for k in range(ky):
                wy = jnp.where(dyr_r == k, 1.0 - fy_r,
                               jnp.where(dyr_r == k - 1, fy_r, 0.0))
                drv_rows.append(g * wy)
            drv = jnp.concatenate(drv_rows, axis=0)   # [ky*C, 128]
            fx = fx_all[r:r + 1]
            dn = (((1,), (1,)), ((), ()))
            contrib = contrib + jax.lax.dot_general(
                drv * (1.0 - fx), a0, dn, preferred_element_type=jnp.float32)
            contrib = contrib + jax.lax.dot_general(
                drv * fx, a1, dn, preferred_element_type=jnp.float32)
        dbands_ref[j] = contrib


def banded_warp_blocked_bwd(g: Array, x_rel: Array, dyr: Array, fy: Array,
                            c: int, gy: int, ky: int, w: int,
                            bw: int = 384) -> Array:
    """dbands [NBROWS*(W/128), ky*C, BW] from dout g [C, NBROWS, gy, W] —
    the exact transpose of banded_warp_blocked/_fused's blend. Same
    (row-group, 128-px-block) window geometry as the forward (callers use
    the same _banded_blocked_prep outputs)."""
    nbrows = x_rel.shape[0]
    nj = w // 128
    jb = 1
    for cand in (8, 6, 4, 3, 2):
        if nj % cand == 0 and cand * ky * c * bw * 4 <= (3 << 20):
            jb = cand
            break
    npb = nj // jb
    wspec = pl.BlockSpec((1, gy, jb * 128), lambda i, j: (i, 0, j))

    dbands = pl.pallas_call(
        functools.partial(_bwd_kernel_blocked, c=c, gy=gy, ky=ky, jb=jb,
                          bw=bw),
        grid=(nbrows, npb),
        in_specs=[pl.BlockSpec((c, 1, gy, jb * 128),
                               lambda i, j: (0, i, 0, j)),
                  wspec, wspec, wspec],
        out_specs=pl.BlockSpec((jb, ky * c, bw),
                               lambda i, j: (i * npb + j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nbrows * nj, ky * c, bw),
                                       jnp.float32),
        interpret=_interpret(),
    )(g.astype(jnp.float32), x_rel, dyr, fy)
    return dbands


def banded_warp_blocked(bands: Array, x_rel: Array, dyr: Array, fy: Array,
                        c: int, gy: int, ky: int, w: int,
                        bw: int = 384) -> Array:
    """Blocked-band blend: bands [NBROWS*(W/128), ky*C, BW] (one band per
    (row-group, 128-px block), ordered blocks-minor), x_rel/dyr/fy
    [NBROWS, gy, W] f32 with x RELATIVE to each block's column anchor.
    Returns [C, NBROWS, gy, W] f32.
    """
    nbrows = x_rel.shape[0]
    nj = w // 128
    assert bands.shape[0] == nbrows * nj, (bands.shape, nbrows, nj)
    assert bands.shape[1:] == (ky * c, bw)
    # superblock: amortize grid overhead over a few 128-px blocks
    jb = 1
    for cand in (8, 6, 4, 3, 2):
        if nj % cand == 0 and cand * ky * c * bw * 2 <= (3 << 20):
            jb = cand
            break
    npb = nj // jb
    wspec = pl.BlockSpec((1, gy, jb * 128), lambda i, j: (i, 0, j))

    out = pl.pallas_call(
        functools.partial(_fwd_kernel_blocked, c=c, gy=gy, ky=ky, jb=jb,
                          bw=bw),
        grid=(nbrows, npb),
        in_specs=[pl.BlockSpec((jb, ky * c, bw),
                               lambda i, j: (i * npb + j, 0, 0)),
                  wspec, wspec, wspec],
        out_specs=pl.BlockSpec((c, 1, gy, jb * 128),
                               lambda i, j: (0, i, 0, j)),
        out_shape=jax.ShapeDtypeStruct((c, nbrows, gy, w), jnp.float32),
        interpret=_interpret(),
    )(bands, x_rel, dyr, fy)
    return out
