"""Bilinear sampling at scattered coordinates + the plane-sweep warp.

This is the hottest op of the whole pipeline (SURVEY.md §3.3: grid_sample
warp ranks #1), re-designed for TPU:

- coordinates are kept in *pixel units* end-to-end (the [-1, 1] normalize /
  denormalize round-trip of torch's grid_sample under align_corners=True is
  the identity, so we never do it);
- the 4-corner bilinear blend is expressed as one flattened gather over H*W
  with per-corner in-bounds masks, which XLA lowers to TPU dynamic-gather;
- everything runs in fp32 (reference fp32 island, models/cost_volume.py:64)
  and the coordinate computation is gradient-stopped, matching
  homo_warping_3D_with_mask (reference models/warping.py:79, torch.no_grad).

Semantics match torch.nn.functional.grid_sample(mode='bilinear',
padding_mode='zeros', align_corners=True) exactly: corners that fall outside
the image contribute zero with their bilinear weight (partial blending at the
border), verified golden-value against torch in tests/test_grid_sample.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .geometry import compose_projection, plane_sweep_coords

Array = jax.Array


def bilinear_sample(img: Array, coords: Array) -> Array:
    """Sample img at scattered (x, y) pixel coordinates, zeros padding.

    Args:
      img: [B, H, W, C].
      coords: [B, ..., 2] pixel-unit (x, y); align_corners=True convention
        (coordinate i is the center of pixel i, valid range [0, size-1]).

    Returns:
      [B, ..., C] sampled values, fp32.

    TPU note: gather throughput is bound by index count, not bytes. Instead
    of 4 single-pixel gathers (one per bilinear corner) this issues ONE
    lax.gather of a 2x2xC patch per sample — 4x fewer indices — and blends
    with per-axis weights that reproduce torch grid_sample's zeros padding
    exactly: gather start indices are clamped to [0, size-2], and each patch
    position only receives weight if it equals the true (unclamped) corner,
    so out-of-image corners contribute 0. Verified against torch in
    tests/test_grid_sample.py. This cut the profiled gather share of a full
    forward from 85% of device time.
    """
    b, h, w, c = img.shape
    # gather in the INPUT dtype: model features are bf16, and the patch
    # tensor is the peak-memory intermediate (4x the sample count) — blending
    # accumulates in f32 below, so bf16 patches lose nothing vs upcasting
    # before the gather.
    out_shape = coords.shape[:-1] + (c,)
    xy = coords.reshape(b, -1, 2).astype(jnp.float32)
    n = xy.shape[1]
    x, y = xy[..., 0], xy[..., 1]

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0

    start_x = jnp.clip(x0, 0, w - 2).astype(jnp.int32)
    start_y = jnp.clip(y0, 0, h - 2).astype(jnp.int32)

    def axis_weights(c0, frac, start, size):
        """[B, N, 2] weights of the two patch positions along one axis."""
        pos0 = start.astype(jnp.float32)
        pos1 = pos0 + 1.0
        w0 = jnp.where(pos0 == c0, 1 - frac, jnp.where(pos0 == c0 + 1, frac, 0.0))
        w1 = jnp.where(pos1 == c0, 1 - frac, jnp.where(pos1 == c0 + 1, frac, 0.0))
        return w0, w1

    wx0, wx1 = axis_weights(x0, fx, start_x, w)
    wy0, wy1 = axis_weights(y0, fy, start_y, h)

    # Pre-shifted operand: AUG[y, x] stacks the 2x2 neighbourhood at (y, x)
    # into 4C contiguous channels, so the bilinear fetch is a PLAIN point
    # gather of a [4C] vector — one index per sample. A patch-shaped gather
    # ([N, 2, 2, C] output) forces TPU layout to pad C up to the 128-lane
    # tile (16x HBM at C=8); the folded 4C trailing dim keeps lanes >= 4C
    # dense. AUG costs 4x the SOURCE image (tiny next to the volume).
    img_p = jnp.pad(img, ((0, 0), (0, 1), (0, 1), (0, 0)))
    aug = jnp.concatenate(
        [img_p[:, :-1, :-1], img_p[:, :-1, 1:],
         img_p[:, 1:, :-1], img_p[:, 1:, 1:]], axis=-1,
    )  # [B, H, W, 4C]; starts are clamped to [0, size-2] so the zero-pad
    #    row/col is never addressed with nonzero weight

    starts = jnp.stack([start_y, start_x], axis=-1)  # [B, N, 2]
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(2,),               # the 4C vector
        collapsed_slice_dims=(1, 2),
        start_index_map=(1, 2),         # indices address (H, W)
        operand_batching_dims=(0,),
        start_indices_batching_dims=(0,),
    )
    patches = jax.lax.gather(
        aug, starts, dnums, slice_sizes=(1, 1, 1, 4 * c),
        mode=jax.lax.GatherScatterMode.CLIP,
    )  # [B, N, 4C]

    # explicit elementwise blend: fuses into a single f32 output loop, so
    # the only materialized buffer is the gather itself
    def term(k, wgt):
        return patches[..., k * c:(k + 1) * c].astype(jnp.float32) * wgt[..., None]

    out = (
        term(0, wy0 * wx0) + term(1, wy0 * wx1)
        + term(2, wy1 * wx0) + term(3, wy1 * wx1)
    )  # [B, N, C]
    return out.reshape(out_shape)


def bilinear_sample_grouped(img: Array, coords: Array, kx: int = 16) -> Array:
    """Bilinear sampling where a leading `group` axis of coords shares one
    gathered patch per pixel.

    Args:
      img: [B, H, W, C].
      coords: [B, G, N, 2] pixel-unit (x, y) — G coordinates per (batch,
        pixel) that are spatially CLOSE (e.g. neighbouring depth hypotheses
        of a fine cascade stage; their epipolar footprint spans a few px).
      kx: patch width in pixels; all G samples whose 2x2 corners fall inside
        the [3, kx] patch anchored at the group's min corner are exact (3
        rows: even a sub-pixel y-spread can straddle an integer boundary, so
        floor(y) spans two values and corners span three rows). Corners
        outside the patch get weight 0 — the same zeros semantics as
        out-of-image samples. (DTU/T&T fine-stage groups span <= ~12 px in x
        and ~0 in y; callers pick kx with margin. tests/test_grid_sample.py
        verifies exactness against the ungrouped path.)

    Returns [B, G, C, N] fp32 — note the TRANSPOSED layout: N stays the
    minormost dim of every materialized buffer. With C minormost (C is 8-64
    here) the TPU (8, 128) memory tile pads the lane dim up to 16x; keeping
    huge-N minor makes every buffer dense. Callers transpose once at the
    cost-regularizer boundary.

    TPU rationale: gathers are index-bound. Grouping G depth slices onto one
    row-contiguous (2, kx, C) patch divides index count by G and reads
    contiguous kx·2C-channel rows (dense lanes: the 2-row dimension is
    pre-folded into channels). The blend is a masked reduction over kx that
    fuses; stage-4 of the DTU eval cascade drops from 28.3M to 7.1M indices.
    """
    b, h, w, c = img.shape
    g = coords.shape[1]
    n = coords.shape[2]

    xy = coords.astype(jnp.float32)
    x, y = xy[..., 0], xy[..., 1]  # [B, G, N]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0

    # per-pixel anchors from the group minima
    ax = jnp.clip(jnp.min(x0, axis=1), 0, w - kx).astype(jnp.int32)  # [B, N]
    ay = jnp.clip(jnp.min(y0, axis=1), 0, h - 3).astype(jnp.int32)

    # fold a 3-row window into channels:
    # AUGY[y, x] = [img[y, x], img[y+1, x], img[y+2, x]]
    img_p = jnp.pad(img, ((0, 0), (0, 2), (0, 0), (0, 0)))
    augy = jnp.concatenate(
        [img_p[:, :-2], img_p[:, 1:-1], img_p[:, 2:]], axis=-1)  # [B,H,W,3C]

    # flatten (W, 3C) so the gathered patch is ONE contiguous row of
    # kx*3C channels — a multi-offset-dim gather (or any reshape of its
    # output) gets a padded layout from the compiler (small trailing dims
    # pad to the 128-lane tile, up to 8x HBM)
    augy_flat = augy.reshape(b, h, w * 3 * c)
    starts = jnp.stack([ay, ax * (3 * c)], axis=-1)  # [B, N, 2]
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(2,),
        collapsed_slice_dims=(1,),
        start_index_map=(1, 2),
        operand_batching_dims=(0,),
        start_indices_batching_dims=(0,),
    )
    patch = jax.lax.gather(
        augy_flat, starts, dnums, slice_sizes=(1, 1, kx * 3 * c),
        mode=jax.lax.GatherScatterMode.CLIP,
    )  # [B, N, kx*3C] — dense lanes (>= 128 for every stage)

    # blend: for each group member, its two corner columns and two corner
    # rows select 4 of the kx*3 patch cells. The cell weights are equality
    # tests against the true (unclamped) corner positions — exact bilinear
    # with zeros for uncovered/out-of-image corners. Unrolled with STATIC
    # channel slices (a [.., kx, 3, C] reshape would materialize a padded
    # copy); XLA fuses the masked multiply-adds into one output loop over
    # the [B, G, C, N] output (N minor -> dense tiles).
    dx = x0 - ax[:, None].astype(jnp.float32)  # [B, G, N]
    dy = y0 - ay[:, None].astype(jnp.float32)
    out = jnp.zeros((b, g, c, n), jnp.float32)
    for k in range(kx):
        wxk = jnp.where(dx == k, 1 - fx, jnp.where(dx == k - 1, fx, 0.0))
        for r in range(3):
            wyr = jnp.where(dy == r, 1 - fy, jnp.where(dy == r - 1, fy, 0.0))
            wgt = wxk * wyr  # [B, G, N]
            cell = patch[..., (k * 3 + r) * c:(k * 3 + r + 1) * c]  # [B, N, C]
            cell_t = jnp.swapaxes(cell, 1, 2)  # [B, C, N] (index permutation
            # inside the fusion; no standalone transposed buffer)
            out = out + cell_t.astype(jnp.float32)[:, None] * wgt[:, :, None, :]
    return out


def _xgrouped_prep(img: Array, coords: Array, gx: int, kx: int):
    """Shared front half of the x-grouped samplers: per-group anchors, the
    patch gather, and per-pixel (dx, dy, fx, fy) blend inputs.

    Returns (patch [B, D*H*Wg, kx*3C], dx, dy, fx, fy each [B, D, GX, M]).
    """
    b, h, w, c = img.shape
    d = coords.shape[1]
    wg = w // gx
    m = h * wg
    assert w % gx == 0, f"W={w} not divisible by gx={gx}"

    # Layout rule (hard-won, see bilinear_sample_grouped): every tensor that
    # might MATERIALIZE must keep a huge dim minor, or the (8, 128) tile
    # lane-pads it up to 16x HBM. So the per-pixel coordinate components are
    # transposed to [B, D, GX, M] (M = H*Wg minor) FIRST, and every derived
    # quantity (corners, fractions, weights) is born in that layout — the
    # gx-minor [B, D, H, Wg, GX] shape never exists.
    def to_gxm(comp):  # [B, D, H, W] -> [B, D, GX, M]
        return jnp.moveaxis(comp.reshape(b, d, m, gx), -1, 2)

    cf = coords.astype(jnp.float32)
    x = to_gxm(cf[..., 0])
    y = to_gxm(cf[..., 1])
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0

    # anchor = per-group min corner over the GX axis. Clamping the *anchor
    # inputs* to [-1, size-1] first changes nothing for contributing pixels
    # (corners wholly outside the image have zero weight regardless) but
    # stops a diverged projection (z ~ 0 -> u = +-1e6) from dragging the
    # anchor away from its octet-mates.
    ax = jnp.clip(jnp.min(jnp.clip(x0, -1, w - 1), axis=2), 0, w - kx)
    ay = jnp.clip(jnp.min(jnp.clip(y0, -1, h - 1), axis=2), 0, h - 3)
    ax = ax.astype(jnp.int32)  # [B, D, M]
    ay = ay.astype(jnp.int32)

    # fold a 3-row window into channels, then flatten (W, 3C) so the patch is
    # ONE contiguous kx*3C row segment (multi-offset-dim gathers get
    # lane-padded layouts; see bilinear_sample_grouped)
    img_p = jnp.pad(img, ((0, 0), (0, 2), (0, 0), (0, 0)))
    augy = jnp.concatenate(
        [img_p[:, :-2], img_p[:, 1:-1], img_p[:, 2:]], axis=-1)  # [B,H,W,3C]
    augy_flat = augy.reshape(b, h, w * 3 * c)

    npix = d * m
    starts = jnp.stack(
        [ay.reshape(b, npix), ax.reshape(b, npix) * (3 * c)], axis=-1)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(2,),
        collapsed_slice_dims=(1,),
        start_index_map=(1, 2),
        operand_batching_dims=(0,),
        start_indices_batching_dims=(0,),
    )
    patch = jax.lax.gather(
        augy_flat, starts, dnums, slice_sizes=(1, 1, kx * 3 * c),
        mode=jax.lax.GatherScatterMode.CLIP,
    )  # [B, D*H*Wg, kx*3C] in img dtype (bf16 patches, f32 blend later)

    dx = x0 - ax[:, :, None].astype(jnp.float32)  # [B, D, GX, M]
    dy = y0 - ay[:, :, None].astype(jnp.float32)
    return patch, dx, dy, fx, fy


def _group_anchors(x0: Array, y0: Array, h: int, w: int, ky: int, wx: int,
                   axes) -> tuple:
    """Per-group patch anchors: min corner over the group `axes`, clamped so
    the [ky, wx] window stays in-image. Clamping the anchor INPUTS to
    [-1, size-1] first changes nothing for contributing pixels (corners
    wholly outside the image have zero weight regardless) but stops a
    diverged projection (z ~ 0 -> u = +-1e6) from dragging the anchor away
    from its group-mates."""
    ax = jnp.clip(jnp.min(jnp.clip(x0, -1, w - 1), axis=axes), 0, w - wx)
    ay = jnp.clip(jnp.min(jnp.clip(y0, -1, h - 1), axis=axes), 0, h - ky)
    return ax.astype(jnp.int32), ay.astype(jnp.int32)


def fold_escape_fraction(coords, h: int, w: int, gy: int = 8, ky: int = 24,
                         wx: int = 12, fold: bool = True,
                         row_group_stride: int = 1, d_stride: int = 1):
    """Diagnostic: fraction of IN-IMAGE corner samples whose corner misses
    the shared patch window (those blend to zero — the out-of-FOV class).
    coords: [B, D, H, W, 2] pixel units. fold=True anchors over (D, gy),
    False over gy only (the unfolded production path). Pure numpy; use to
    validate fold_ky/fold_wx on a new dataset's geometry before enabling
    fold_depth (tests/test_fold_window.py pins DTU).

    row_group_stride / d_stride subsample the evaluated row groups (and,
    for fold=False where each depth's window is independent, the depth
    slices) — the estimate stays exact per evaluated group; use for cheap
    per-scan pre-flight checks (ops/window_check.py)."""
    import numpy as np

    d = coords.shape[1]
    c = np.asarray(coords).reshape(-1, d, h // gy, gy, w, 2)
    if d_stride > 1 and not fold:
        c = c[:, ::d_stride]
    if row_group_stride > 1:
        c = c[:, :, ::row_group_stride]
    x0 = np.floor(c[..., 0])
    y0 = np.floor(c[..., 1])
    axes = (1, 3) if fold else (3,)
    ax = np.clip(np.min(np.clip(x0, -1, w - 1), axis=axes, keepdims=True),
                 0, w - wx)
    ay = np.clip(np.min(np.clip(y0, -1, h - 1), axis=axes, keepdims=True),
                 0, h - ky)
    ok = (x0 <= ax + wx - 2) & (y0 <= ay + ky - 2)
    inimg = (x0 >= -1) & (x0 <= w - 1) & (y0 >= -1) & (y0 <= h - 1)
    return float((inimg & ~ok).mean())


def banded_escape_fraction(coords, h: int, w: int, gy: int = 8,
                           ky: int = 16, fold: bool = False,
                           block_w: int = 0, row_group_stride: int = 1,
                           d_stride: int = 1) -> float:
    """Diagnostic for the banded warp's windows: fraction of IN-IMAGE
    corner samples missing the shared band (those blend to zero — the
    out-of-FOV class). block_w > 0 evaluates the production BLOCKED path
    (per-(row-group, block_w-px block) robust anchors — the whole-row
    anchor is unsound under epipolar tilt: in-image v spans up to 80 rows
    across a stage-4 DTU row); block_w == 0 evaluates the whole-row path
    (narrow images). Anchors are in-image-robust, matching _banded_prep.
    Validate on a new dataset's cams before relying on warp_mode='banded'
    (tests/test_fold_window.py pins DTU). Pure numpy; coords
    [B, D, H, W, 2] pixel units."""
    import numpy as np

    d = coords.shape[1]
    bw = block_w or w
    c = np.asarray(coords).reshape(-1, d, h // gy, gy, w // bw, bw, 2)
    # subsampling: exact per evaluated (depth, row-group) — windows never
    # couple across row groups, nor across depths when fold=False
    if d_stride > 1 and not fold:
        c = c[:, ::d_stride]
    if row_group_stride > 1:
        c = c[:, :, ::row_group_stride]
    y0 = np.floor(c[..., 1])
    x0 = np.floor(c[..., 0])
    inimg = ((y0 >= -1) & (y0 <= h - 1) & (x0 >= -1) & (x0 <= w - 1))
    big = np.float32(1e9)
    axes = (1, 3, 5) if fold else (3, 5)
    ay = np.clip(np.min(np.where(inimg, y0, big), axis=axes, keepdims=True),
                 0, h - ky)
    k0 = None
    if block_w:
        # the blocked path also windows columns to 3 adjacent 128-chunks
        k0 = np.clip(
            np.min(np.where(inimg, x0, big), axis=axes, keepdims=True)
            // 128, 0, max(w // 128 - 3, 0)) * 128

    # count PER CORNER: a corner only needs band coverage when it is itself
    # inside the image (out-of-image corners carry zero weight regardless —
    # e.g. the second corner of a bottom-row sample)
    lost = total = 0.0
    for cy in (0, 1):
        for cx in (0, 1):
            ry, rx = y0 + cy, x0 + cx
            live = (ry >= 0) & (ry <= h - 1) & (rx >= 0) & (rx <= w - 1)
            covered = (ry >= ay) & (ry <= ay + ky - 1)
            if k0 is not None:
                covered &= (rx >= k0) & (rx <= k0 + 3 * 128 - 1)
            lost += float((live & ~covered).sum())
            total += float(live.sum())
    return lost / max(total, 1.0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _gather_patches(augx: Array, starts: Array, ky: int, wxc: int) -> Array:
    """Full-minor 2D-slice patch gather with a scatter-safe VJP.

    Forward: native gather (the (1, 1, ky, wxc) slice spans the full minor
    dim). Backward: autodiff's transpose would be a scatter-add with a 2D
    update window, which XLA's TPU backend expands into a serial while-loop
    of dynamic-update-slices (measured 7.1 s of an 8.4 s train step at the
    DTU MS protocol — one iteration per index). Scatters with a 1D
    full-minor window DO lower natively, so the hand-written VJP splits the
    patch into its ky rows and issues ky native row scatter-adds.

    starts is int32 (non-differentiable); coordinates reach it through
    floor/cast so no tangent exists.
    """
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(0, 1),
        collapsed_slice_dims=(1,),
        start_index_map=(1, 2),
        operand_batching_dims=(0,),
        start_indices_batching_dims=(0,),
    )
    return jax.lax.gather(
        augx, starts, dnums, slice_sizes=(1, 1, ky, wxc),
        mode=jax.lax.GatherScatterMode.CLIP,
    )  # [ky, wxc, B, N]


def _gather_patches_fwd(augx, starts, ky, wxc):
    # residuals must be JAX types: carry augx's dtype via an empty exemplar
    return _gather_patches(augx, starts, ky, wxc), (
        starts, jnp.zeros((0,) + augx.shape, augx.dtype))


def _gather_patches_bwd(ky, wxc, res, ct):
    starts, ex = res
    shape, dtype = ex.shape[1:], ex.dtype
    dn1 = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(2,),
        inserted_window_dims=(1, 2),
        scatter_dims_to_operand_dims=(1, 2),
        operand_batching_dims=(0,),
        scatter_indices_batching_dims=(0,),
    )
    sx = starts[..., 0]
    sy = starts[..., 1]
    # f32 accumulator: repeated bf16 adds would round per-contribution
    acc = jnp.zeros(shape, jnp.float32)
    for r in range(ky):
        acc = jax.lax.scatter_add(
            acc, jnp.stack([sx, sy + r], -1),
            jnp.moveaxis(ct[r], 0, -1).astype(jnp.float32), dn1,
            mode=jax.lax.GatherScatterMode.CLIP)
    return acc.astype(dtype), None


_gather_patches.defvjp(_gather_patches_fwd, _gather_patches_bwd)


def _ygrouped_impl(
    img: Array, coords: Array, gy: int = 8, ky: int = 16, wx: int = 6,
    patch_budget: int = 1 << 30, fold_depth: bool = False,
) -> Array:
    """Bilinear sampling where GY consecutive OUTPUT ROWS share one patch
    gather, blended by the layout-pinned Pallas kernel — the production TPU
    warp path (ops/pallas/warp_blend.py explains why the group axis must be
    Y: the group members land on consecutive output rows, so the kernel's
    [C, GY, PBX] accumulator block-writes straight into [C, B*D*H, W] with
    no relayout on either side).

    The plane-sweep map v(y) is monotone in y with derivative ~O(1) and u(y)
    drifts slowly, so the 2x2 corners of gy=8 consecutive rows' samples fit
    one [ky=16, wx=6] patch (exact while |dv/dy| <= (ky-2)/(gy-1) = 2 and
    |du/dy| <= (wx-2)/(gy-1) ~ 0.57; corners outside the window get weight 0,
    the same zeros class as out-of-image corners). One gather index per
    group: 8x fewer than per-sample (stage 4 DTU eval: 28.3M -> 3.5M;
    gathers are index-bound at ~12-36 ns/index).

    Args:
      img: [B, H, W, C] source features; H % gy == 0, C % 4 == 0.
      coords: [B, D, H, W, 2] pixel-unit (x, y).
      patch_budget: cap (bytes) on the materialized patch temp — the depth
        axis is chunked with lax.map so the [B*Dc*Hg*W, ky, wx*C] gather
        output stays under it (stage 4 DTU eval would otherwise peak at
        ~5.4 GB per source view).
      fold_depth: share ONE (wider) patch across ALL D hypotheses of a
        pixel group — exact only for re-centered fine-stage bands whose
        epipolar footprint fits the window (callers widen ky/wx; see
        blend_ygrouped_dfold). Another D-fold fewer gather indices.

    Returns [B, D, C, H*W] fp32 (N-minor).
    """
    b, h, w, c = img.shape
    d = coords.shape[1]
    hg = h // gy
    m = hg * w
    assert h % gy == 0, f"H={h} not divisible by gy={gy}"

    from .pallas.warp_blend import blend_ygrouped, blend_ygrouped_dfold

    # x-major image with a wx-wide x-window folded into channels. The gather
    # slice (1, 1, ky, wx*C) covers the FULL minor dim: XLA's TPU backend
    # keeps full-minor slices as a native gather, while any partial-minor
    # slice (a flat [B, W, H*wx*C] operand) is expanded into a while-loop of
    # dynamic-slices (~10 s/map measured). The ky rows of the slice are
    # contiguous in memory (H and the folded channels are the two minor
    # dims), so each index fetches one contiguous ky*wx*C run. wx=8 keeps
    # wx*C at 64/128 for C=8/16 so the (8/16, 128) tile pads the [N, ky,
    # wx*C] gather output at most 2x (a transposed gather output — offset
    # dims first — lowers to gather + materialized transpose and OOMs).
    img_t = jnp.transpose(img, (0, 2, 1, 3))  # [B, W, H, C]
    img_tp = jnp.pad(img_t, ((0, 0), (0, wx - 1), (0, 0), (0, 0)))
    augx = jnp.concatenate(
        [img_tp[:, i:i + w] for i in range(wx)], axis=-1)  # [B, W, H, wx*C]

    # offset_dims=(0, 1): the gather RESULT is [ky, wx*C, B, N] — the
    # blend kernel's cell-major layout with the huge N dim minor. XLA
    # implements this as gather + transpose whose [N, ky, wx*C] temp is
    # tile-padded (wx*C < 128 lanes); the lax.map chunking below bounds
    # that temp (measured faster end-to-end than feeding the kernel the
    # native [N, ky, wx*C] layout and transposing slabs in-kernel:
    # 96 vs 143 ms at DTU stage-4 scale).
    def sample_chunk(coords_c: Array) -> Array:
        """[B, Dc, H, W, 2] -> [B, Dc, C, H*W] through gather + blend."""
        dc = coords_c.shape[1]
        # pixel (b, d, hg*gy+g, x) -> group (b, d, hg, x), member g: the
        # [B, Dc, Hg, GY, W] view keeps W minor and GY (=8) sublane-sized,
        # so every materialized tensor tiles cleanly
        cf = coords_c.astype(jnp.float32).reshape(b, dc, hg, gy, w, 2)
        x = cf[..., 0]
        y = cf[..., 1]
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = x - x0
        fy = y - y0

        # anchors: per-group min corner over the GY axis
        ax, ay = _group_anchors(x0, y0, h, w, ky, wx, axes=3)  # [B,Dc,Hg,W]

        npix = dc * m
        starts = jnp.stack([ax.reshape(b, npix), ay.reshape(b, npix)], -1)
        patch = _gather_patches(augx, starts, ky, wx * c)
        # [ky, wx*C, B, N] in img dtype (bf16 patches, f32 blend in-kernel)

        dxg = x0 - ax[:, :, :, None].astype(jnp.float32)  # [B,Dc,Hg,GY,W]
        dyg = y0 - ay[:, :, :, None].astype(jnp.float32)

        rows = b * dc * hg

        def to_rows(a):  # [B, Dc, Hg, GY, W] -> [ROWS, GY, W]
            return a.reshape(rows, gy, w)

        out = blend_ygrouped(
            patch.reshape(ky, wx * c, b * npix),
            to_rows(dxg), to_rows(dyg), to_rows(fx), to_rows(fy),
            c, gy, ky, wx, w,
        )  # [C, B*Dc*H, W]
        out = out.reshape(c, b, dc, h * w)
        return jnp.transpose(out, (1, 2, 0, 3))  # [B, Dc, C, N], N minor

    def sample_fold(coords_c: Array) -> Array:
        """[B, D, H, W, 2] -> [B, D, C, H*W]: ONE patch per pixel group
        covering every depth hypothesis (anchor = min corner over D AND the
        gy rows); the blend kernel revisits the resident patch D times."""
        cf = coords_c.astype(jnp.float32).reshape(b, d, hg, gy, w, 2)
        x = cf[..., 0]
        y = cf[..., 1]
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = x - x0
        fy = y - y0

        ax, ay = _group_anchors(x0, y0, h, w, ky, wx, axes=(1, 3))  # [B,Hg,W]

        starts = jnp.stack([ax.reshape(b, m), ay.reshape(b, m)], -1)
        patch = _gather_patches(augx, starts, ky, wx * c)  # [ky, wxC, B, M]

        dxg = x0 - ax[:, None, :, None, :].astype(jnp.float32)
        dyg = y0 - ay[:, None, :, None, :].astype(jnp.float32)  # [B,D,Hg,GY,W]
        rows = b * d * hg

        def to_rows(a):  # [B, D, Hg, GY, W] -> [ROWS, GY, W], (b, d, hg)
            return a.reshape(rows, gy, w)

        out = blend_ygrouped_dfold(
            patch.reshape(ky, wx * c, b * m),
            to_rows(dxg), to_rows(dyg), to_rows(fx), to_rows(fy),
            c, gy, ky, wx, w, d, hg,
        )  # [C, B*D*H, W]
        out = out.reshape(c, b, d, h * w)
        return jnp.transpose(out, (1, 2, 0, 3))  # [B, D, C, N]

    if fold_depth:
        # patch count is D-independent; at production scales it fits the
        # budget whole (stage 4 DTU eval: 0.22M patches x 24x96 bf16 cells
        # ~ 1.0 GB). No depth chunking needed or useful (chunking D would
        # not shrink the patch).
        return sample_fold(coords)

    bytes_per_d = b * m * ky * max(wx * c, 128) * img.dtype.itemsize
    dc = max(1, min(d, patch_budget // max(1, bytes_per_d)))
    while d % dc:
        dc -= 1
    if dc == d:
        return sample_chunk(coords)
    chunks = jnp.moveaxis(
        coords.reshape(b, d // dc, dc, h, w, 2), 1, 0)  # [nc, B, dc, H, W, 2]
    out = jax.lax.map(sample_chunk, chunks)  # [nc, B, dc, C, N]
    return jnp.moveaxis(out, 0, 1).reshape(b, d, c, h * w)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _ygrouped_stopgrad(img, coords, gy, ky, wx, patch_budget, fold_depth):
    """Y-grouped sampler for gradient-STOPPED coordinates (the reference
    default: homo_warping_3D_with_mask computes the grid under torch.no_grad,
    reference models/warping.py:79): d/dcoords is defined as zero.

    Why a second custom VJP on top of _gather_patches: even with the row
    scatter-adds, transposing the y-grouped formulation replays the whole
    grouped pipeline — ky sequential scatter passes over the [B, W, H, wx*C]
    augmented accumulator plus the blend-kernel VJP, measured 1.70 s vs
    0.17 s for the per-sample transpose at train stage-4 scale (512x640x8,
    D=8). Sampling is LINEAR in img, and the per-sample folded-channel path
    (bilinear_sample) computes the same linear map, so the backward here is
    jax.linear_transpose of bilinear_sample: ONE native 4C-window
    scatter-add, no forward recompute (linear_transpose needs only the
    abstract img, not its value).
    """
    return _ygrouped_impl(img, coords, gy, ky, wx, patch_budget, fold_depth)


def _ygrouped_stopgrad_fwd(img, coords, gy, ky, wx, patch_budget, fold_depth):
    out = _ygrouped_stopgrad(img, coords, gy, ky, wx, patch_budget, fold_depth)
    # residuals: coords + an empty exemplar carrying img's shape/dtype
    return out, (coords, jnp.zeros((0,) + img.shape, img.dtype))


def _ygrouped_stopgrad_bwd(gy, ky, wx, patch_budget, fold_depth, res, ct):
    coords, ex = res
    shape, dtype = ex.shape[1:], ex.dtype
    b, d, h, w = coords.shape[:4]
    c = ct.shape[2]
    if h % 8 == 0:
        # banded matmul transpose (banded_image_grad): the per-sample
        # linear_transpose below is a 4C-window scatter-add that ran at
        # 1 GB/s (~270 ms/step) in the r3 train profile
        ct_cm = jnp.moveaxis(ct, 2, 0).reshape(c, b, d, h * w)
        return (banded_image_grad(ct_cm, coords, shape, dtype, gy=8),
                jnp.zeros_like(coords))
    # ct: [B, D, C, H*W] f32 -> the per-sample layout [B, D, H, W, C]
    ct_t = jnp.moveaxis(ct, 2, 3).reshape(b, d, h, w, c)
    f = lambda im: bilinear_sample(im, coords)
    (gimg,) = jax.linear_transpose(
        f, jax.ShapeDtypeStruct(shape, dtype))(ct_t.astype(jnp.float32))
    return gimg.astype(dtype), jnp.zeros_like(coords)


_ygrouped_stopgrad.defvjp(_ygrouped_stopgrad_fwd, _ygrouped_stopgrad_bwd)


def bilinear_sample_ygrouped(
    img: Array, coords: Array, gy: int = 8, ky: int = 16, wx: int = 6,
    patch_budget: int = 1 << 30, coord_grad: bool = False,
    fold_depth: bool = False,
) -> Array:
    """Production TPU warp sampler (see _ygrouped_impl for the algorithm).

    coord_grad=False (default, matching the reference's no_grad warp grid)
    routes through a custom VJP whose backward is the per-sample transpose —
    one native scatter-add instead of replaying the grouped gather pipeline
    (10x faster backward, see _ygrouped_stopgrad). coord_grad=True is the
    differentiable-coordinates variant (reference models/warping.py:112
    diff_homo_warping): it runs the per-sample sampler, whose autodiff
    gives EXACT d/dcoords — the grouped pipeline cannot (its weights are
    equality tests against floor'd corners and its blend kernel defines no
    coordinate cotangent: gradients there would be silently zero).

    fold_depth=True shares one (wider: callers raise ky/wx) patch across all
    D hypotheses of each pixel group — fine-stage bands only.
    """
    if coord_grad:
        b, d, h, w = coords.shape[:4]
        warped = bilinear_sample(img, coords)  # [B, D, H, W, C]
        return jnp.moveaxis(warped, -1, 2).reshape(b, d, -1, h * w)
    return _ygrouped_stopgrad(img, coords, gy, ky, wx, patch_budget,
                              fold_depth)


def bilinear_sample_xgrouped(
    img: Array, coords: Array, gx: int = 8, kx: int = 16,
    backend: str = "xla",
) -> Array:
    """Bilinear sampling where GX consecutive x-pixels share one patch gather.

    The plane-sweep map u(x) is monotone in x with derivative ~O(1) (same
    pixel units on both sides), so the 2x2 corners of gx=8 consecutive output
    pixels always fall inside one [3, kx] source patch — unlike depth-axis
    grouping this holds for EVERY cascade stage including the full-range
    first sweep, because the group spans output pixels, not hypotheses.
    Gather index count drops by gx (stage 4 of the DTU eval cascade:
    28.3M -> 3.5M indices; gathers are index-bound at ~12-36 ns/index).

    Args:
      img: [B, H, W, C] source features.
      coords: [B, D, H, W, 2] pixel-unit (x, y); W % gx == 0.
      gx: output pixels per shared patch (along x).
      kx: patch width; exact while the octet's corner span fits (requires
        du/dx <= (kx - 2) / (gx - 1), i.e. ~2.0 at the defaults). Corners
        outside the patch get weight 0 — the same zeros class as
        out-of-image corners. Verified vs the per-sample path in
        tests/test_grid_sample.py.
      backend: unused legacy knob (the Pallas production path is the
        Y-grouped sampler, bilinear_sample_ygrouped — grouping along X
        cannot reassemble natural pixel order without a gx-minor tensor
        that XLA lane-pads 16x).

    Returns [B, D, C, H*W] fp32 — N-minor layout (see
    bilinear_sample_grouped: a C-minor volume lane-pads up to 16x on the
    (8, 128) TPU tile).
    """
    del backend
    b, h, w, c = img.shape
    d = coords.shape[1]
    wg = w // gx
    m = h * wg
    patch, dx, dy, fx, fy = _xgrouped_prep(img, coords, gx, kx)

    # XLA blend: hoist the 3 row weights out of the kx loop
    wy = [
        jnp.where(dy == r, 1 - fy, jnp.where(dy == r - 1, fy, 0.0))
        for r in range(3)
    ]

    # accumulate into [B, D, C, GX, M]: cell broadcasts over the middle GX
    # axis, weights over the middle C axis (the same structure as
    # bilinear_sample_grouped's [B, G, C, N] accumulator, which is
    # layout-safe); the 3*kx masked multiply-adds fuse into one output loop.
    out = jnp.zeros((b, d, c, gx, m), jnp.float32)
    for k in range(kx):
        wxk = jnp.where(dx == k, 1 - fx, jnp.where(dx == k - 1, fx, 0.0))
        for r in range(3):
            wgt = wxk * wy[r]  # [B, D, GX, M]
            cell = patch[..., (k * 3 + r) * c:(k * 3 + r + 1) * c]
            # [B, N'=(D, M), C] -> [B, D, C, M] (index permutation in-fusion)
            cell_t = jnp.swapaxes(cell.reshape(b, d, m, c), 2, 3)
            out = out + cell_t.astype(jnp.float32)[:, :, :, None] * wgt[:, :, None]
    # one reorder of the finished volume to [B, D, C, H*W]: interleave the
    # octet position back into the pixel axis ((H, Wg, GX) -> (H, W))
    out = jax.lax.optimization_barrier(out)
    out = out.reshape(b, d, c, gx, h, wg)
    out = jnp.transpose(out, (0, 1, 2, 4, 5, 3))
    return out.reshape(b, d, c, h * w)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _persample_stopgrad(img, coords, banded_bwd=True):
    """Per-sample folded-channel sampler with gradient-stopped coordinates.

    Forward is bilinear_sample unchanged; on TPU the image backward routes
    through the banded matmul transpose (banded_image_grad) instead of
    autodiff's per-sample 4C-window scatter-add — the r4 train profile
    measured those scatters at 1 GB/s (~10 ms per source view at the
    folded stage-1/2 train crops, fusion.42x). Off-TPU (interpret-mode
    kernels) keeps the exact linear_transpose; banded_bwd=False forces it
    (callers under vmap/SPMD sharding, where the banded pallas_call is
    unvalidated — the same rule that demotes the banded FORWARD there)."""
    return bilinear_sample(img, coords)


def _persample_stopgrad_fwd(img, coords, banded_bwd=True):
    return (_persample_stopgrad(img, coords, banded_bwd),
            (coords, jnp.zeros((0,) + img.shape, img.dtype)))


def _persample_banded_bwd(ct, coords, shape, dtype):
    """Banded-transpose image gradient for a per-sample-layout cotangent
    ct [B, D, H, W, C] (the folded warp's output layout)."""
    b, d, h, w = coords.shape[:4]
    c = shape[-1]
    ct_cm = jnp.transpose(ct.astype(jnp.float32),
                          (4, 0, 1, 2, 3)).reshape(c, b, d, h * w)
    return banded_image_grad(ct_cm, coords, shape, dtype, gy=8)


def _persample_stopgrad_bwd(banded_bwd, res, ct):
    coords, ex = res
    shape, dtype = ex.shape[1:], ex.dtype
    h = coords.shape[2]
    c = shape[-1]
    on_tpu = jax.default_backend() in ("tpu", "axon")
    # C cap mirrors the banded FORWARD's: the transpose's contraction rows
    # scale with ky*C, so wide-C folded stages (train stage1 C=64 / stage2
    # C=32) measured 64/93 ms through the whole-row banded bwd vs ~10 ms
    # for autodiff's per-sample scatter (r4t3 trace) — banded only pays
    # at C <= 16
    if banded_bwd and on_tpu and h % 8 == 0 and c <= 16:
        return (_persample_banded_bwd(ct, coords, shape, dtype),
                jnp.zeros_like(coords))
    f = lambda im: bilinear_sample(im, coords)
    (gimg,) = jax.linear_transpose(
        f, jax.ShapeDtypeStruct(shape, dtype))(ct.astype(jnp.float32))
    return gimg.astype(dtype), jnp.zeros_like(coords)


_persample_stopgrad.defvjp(_persample_stopgrad_fwd, _persample_stopgrad_bwd)


def homography_warp(
    src_feat: Array,
    src_proj: Array,
    ref_proj: Array,
    depth_values: Array,
    stop_coord_grad: bool = True,
    banded_bwd: bool = True,
):
    """Plane-sweep warp of src features into the ref frustum.

    Args:
      src_feat: [B, H, W, C] source-view features (any float dtype; warping
        runs fp32).
      src_proj / ref_proj: [B, 4, 4] composed projections (K·E), see
        geometry.compose_projection.
      depth_values: [B, D] or [B, D, H, W] depth hypotheses.
      stop_coord_grad: gradient-stop the warp coordinates (reference default
        homo_warping_3D_with_mask; False gives the diff_ variant,
        models/warping.py:112-152).

    Returns:
      warped: [B, D, H, W, C] fp32.
      invalid: [B, D, H, W] bool mask (outside FOV or behind camera).
    """
    b, h, w, _ = src_feat.shape
    coords, invalid = plane_sweep_coords(src_proj, ref_proj, depth_values, h, w)
    if stop_coord_grad:
        coords = jax.lax.stop_gradient(coords)
        invalid = jax.lax.stop_gradient(invalid)
        # custom VJP: banded matmul-transpose image gradient on TPU (the
        # autodiff backward is a 1 GB/s per-sample scatter-add)
        return _persample_stopgrad(src_feat, coords, banded_bwd), invalid
    warped = bilinear_sample(src_feat, coords)
    return warped, invalid


def homography_warp_grouped(
    src_feat: Array,
    src_proj: Array,
    ref_proj: Array,
    depth_values: Array,
    kx: int = 16,
    stop_coord_grad: bool = True,
):
    """Plane-sweep warp with ONE patch gather per pixel covering ALL depth
    hypotheses (see bilinear_sample_grouped). Exact when the per-pixel
    epipolar footprint of the hypothesis band fits a [2, kx] patch — the fine
    cascade stages' bands span a few pixels (their hypotheses are a narrow
    re-centered band, ops/sampling.py schedule_inverse_range).

    Returns warped [B, D, C, H*W] fp32 (the grouped sampler's N-minor
    layout; see bilinear_sample_grouped) and the invalid mask.
    """
    b, h, w, _ = src_feat.shape
    d = depth_values.shape[1]
    coords, invalid = plane_sweep_coords(src_proj, ref_proj, depth_values, h, w)
    if stop_coord_grad:
        coords = jax.lax.stop_gradient(coords)
        invalid = jax.lax.stop_gradient(invalid)
    flat = coords.reshape(b, d, h * w, 2)
    warped = bilinear_sample_grouped(src_feat, flat, kx=kx)
    return warped, invalid


def homography_warp_xgrouped(
    src_feat: Array,
    src_proj: Array,
    ref_proj: Array,
    depth_values: Array,
    gx: int = 8,
    kx: int = 16,
    stop_coord_grad: bool = True,
):
    """Plane-sweep warp with one patch gather per gx consecutive ref pixels
    (see bilinear_sample_xgrouped). Unlike the depth-grouped variant this is
    exact for full-range sweeps too, so it serves every cascade stage.

    Returns warped [B, D, C, H*W] fp32 (N-minor) and the invalid mask.
    """
    b, h, w, _ = src_feat.shape
    coords, invalid = plane_sweep_coords(src_proj, ref_proj, depth_values, h, w)
    if stop_coord_grad:
        coords = jax.lax.stop_gradient(coords)
        invalid = jax.lax.stop_gradient(invalid)
    warped = bilinear_sample_xgrouped(src_feat, coords, gx=gx, kx=kx)
    return warped, invalid


def homography_warp_ygrouped(
    src_feat: Array,
    src_proj: Array,
    ref_proj: Array,
    depth_values: Array,
    gy: int = 8,
    ky: int = 16,
    wx: int = 6,
    stop_coord_grad: bool = True,
    fold_depth: bool = False,
    patch_budget: int = 1 << 30,
):
    """Plane-sweep warp with one patch gather per gy consecutive output ROWS,
    blended by the Pallas kernel (see bilinear_sample_ygrouped) — the
    production TPU warp. Exact for every cascade stage (fold_depth=True
    additionally shares the patch across the depth band: fine stages only;
    callers widen ky/wx to cover the band's epipolar footprint).

    Returns warped [B, D, C, H*W] fp32 (N-minor) and the invalid mask.
    """
    b, h, w, _ = src_feat.shape
    coords, invalid = plane_sweep_coords(src_proj, ref_proj, depth_values, h, w)
    if stop_coord_grad:
        coords = jax.lax.stop_gradient(coords)
        invalid = jax.lax.stop_gradient(invalid)
    warped = bilinear_sample_ygrouped(
        src_feat, coords, gy=gy, ky=ky, wx=wx, patch_budget=patch_budget,
        coord_grad=not stop_coord_grad, fold_depth=fold_depth)
    return warped, invalid


def homography_warp_cams(
    src_feat: Array,
    src_cam: Array,
    ref_cam: Array,
    depth_values: Array,
    **kwargs,
):
    """Convenience wrapper taking [B, 2, 4, 4] camera stacks."""
    return homography_warp(
        src_feat,
        compose_projection(src_cam),
        compose_projection(ref_cam),
        depth_values,
        **kwargs,
    )


# ---------------------------------------------------------------------------
# Banded-matmul warp (the MXU formulation — ops/pallas/warp_band.py)
# ---------------------------------------------------------------------------


def _band_gather(img_f: Array, starts: Array, ky: int, cw: int) -> Array:
    """Full-minor row-band gather: img_f [B, H, C*W], starts [B, NB, 1]
    (band top row) -> [B, NB, ky, C*W]. One index per BAND (thousands, not
    millions): the slice is contiguous [ky, C*W] rows and spans the full
    minor dim, so XLA keeps it a native gather running at memory bandwidth."""
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(2, 3),
        collapsed_slice_dims=(),
        start_index_map=(1,),
        operand_batching_dims=(0,),
        start_indices_batching_dims=(0,),
    )
    return jax.lax.gather(
        img_f, starts, dnums, slice_sizes=(1, ky, cw),
        mode=jax.lax.GatherScatterMode.CLIP,
    )


def _band_scatter(dbands: Array, starts: Array, b: int, h: int,
                  cw: int, ky: int) -> Array:
    """Transpose of _band_gather: dbands [B, NB, ky, C*W] f32 scatter-added
    back into [B, H, C*W]. ky native 1D full-minor-window row scatter-adds
    (the _gather_patches_bwd pattern), each with only NB indices."""
    dn = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(2,),
        inserted_window_dims=(1,),
        scatter_dims_to_operand_dims=(1,),
        operand_batching_dims=(0,),
        scatter_indices_batching_dims=(0,),
    )
    acc = jnp.zeros((b, h, cw), jnp.float32)
    for r in range(ky):
        acc = jax.lax.scatter_add(
            acc, starts + r, dbands[:, :, r, :], dn,
            mode=jax.lax.GatherScatterMode.CLIP)
    return acc


def _banded_prep(coords_c: Array, b: int, h: int, w: int, gy: int, ky: int,
                 fold_depth: bool):
    """Per-chunk coordinate prep shared by the banded fwd and bwd.

    Returns (x_r, dyr_r, fy_r [NBROWS, gy, W] f32 with row-groups ordered
    (b, d, hg), starts [B, NB_per_b, 1] int32, d_shared, hg)."""
    dc = coords_c.shape[1]
    hg = h // gy
    cf = coords_c.astype(jnp.float32).reshape(b, dc, hg, gy, w, 2)
    x = cf[..., 0]
    y = cf[..., 1]
    y0 = jnp.floor(y)
    fy = y - y0
    # ROBUST anchor: min over the band's IN-IMAGE samples only. A single
    # diverged/out-of-FOV sample (projection past the image top) would
    # otherwise pin the whole band at row 0 while the in-image samples sit
    # far below — out-of-image samples blend to zero regardless, so they
    # need no band coverage.
    ylo = jnp.where((y0 >= -1) & (y0 <= h - 1), y0, jnp.float32(1e9))
    if fold_depth:
        ay = jnp.clip(jnp.min(ylo, axis=(1, 3, 4)), 0, h - ky)  # [B, Hg]
        dyr = y0 - ay[:, None, :, None, None]
        starts = ay.astype(jnp.int32).reshape(b, hg, 1)
        d_shared = dc
    else:
        ay = jnp.clip(jnp.min(ylo, axis=(3, 4)), 0, h - ky)  # [B, Dc, Hg]
        dyr = y0 - ay[..., None, None]
        starts = ay.astype(jnp.int32).reshape(b, dc * hg, 1)
        d_shared = 1

    nbrows = b * dc * hg
    to_r = lambda a: a.reshape(nbrows, gy, w)
    return to_r(x), to_r(dyr), to_r(fy), starts, d_shared, hg


def _banded_blocked_prep(coords_c: Array, b: int, h: int, w: int, gy: int,
                         ky: int, src_nj: int = 0):
    """Per-(b, d, row-group, 128-px block) robust anchors for the BLOCKED
    banded path: whole-row bands are unsound under epipolar tilt (in-image
    v spans up to 80 rows across a stage-4 DTU row; <= 14.4 within any
    128-px block — measured in tests/test_fold_window.py's geometry).

    Returns (x_rel, dyr, fy [NBROWS, gy, W] f32 — x RELATIVE to each
    block's 128-aligned column anchor — and starts [B, NBb, 2] int32 of
    (band top row, column chunk index)).

    src_nj: source-image chunk count when it differs from the OUTPUT grid
    width (the W-padded variant for narrow crops: grid padded to a 128
    multiple, source padded to >= 384 so the 3-chunk window is always
    legal). 0 = same as the grid (the usual shared-resolution case)."""
    dc = coords_c.shape[1]
    hg = h // gy
    nj = w // 128
    src_nj = src_nj or nj
    cf = coords_c.astype(jnp.float32).reshape(b, dc, hg, gy, nj, 128, 2)
    x = cf[..., 0]
    y = cf[..., 1]
    y0 = jnp.floor(y)
    fy = y - y0
    x0 = jnp.floor(x)
    in_img = ((y0 >= -1) & (y0 <= h - 1)
              & (x0 >= -1) & (x0 <= src_nj * 128 - 1))
    big = jnp.float32(1e9)
    ay = jnp.clip(jnp.min(jnp.where(in_img, y0, big), axis=(3, 5)),
                  0, h - ky)                       # [B, Dc, Hg, NJ]
    # 3-chunk window: alignment can waste up to 127 columns of the window,
    # so 2 chunks guaranteed only 129 usable columns — less than one
    # block's ~130-px u-span under tilt (measured u-window escapes). Three
    # chunks guarantee 257.
    k0 = jnp.clip(jnp.min(jnp.where(in_img, x0, big), axis=(3, 5)) // 128,
                  0, src_nj - 3).astype(jnp.int32)     # chunk index
    dyr = y0 - ay[:, :, :, None, :, None]
    x_rel = x - (k0 * 128).astype(jnp.float32)[:, :, :, None, :, None]
    starts = jnp.stack(
        [ay.astype(jnp.int32).reshape(b, dc * hg * nj),
         k0.reshape(b, dc * hg * nj)], axis=-1)    # [B, NBb, 2]
    # flat (b, row, chunk) triples for the fused-DMA kernel, ordered
    # (row-group-major, block-minor) = ((b, d, hg), nj). COMPONENT-MAJOR
    # [3, NB]: the SMEM prefetch pads the minor dim, so [NB, 3] would ask
    # ~43x the bytes and overflow SMEM at stage-3/4 protocol scale.
    b_idx = jnp.broadcast_to(
        jnp.arange(b, dtype=jnp.int32)[:, None], (b, dc * hg * nj))
    starts3 = jnp.stack(
        [b_idx.reshape(-1),
         ay.astype(jnp.int32).reshape(-1),
         k0.reshape(-1)], axis=0)                  # [3, B*NBb]

    nbrows = b * dc * hg
    to_r = lambda a: a.reshape(nbrows, gy, w)
    return to_r(x_rel), to_r(dyr), to_r(fy), starts, starts3


def _band_gather_blocked(img_c5: Array, starts: Array, ky: int,
                         c: int) -> Array:
    """img_c5 [B, H, C, W/128, 128]; starts [B, NBb, 2] of (row, chunk) ->
    [B, NBb, ky, C, 2, 128]: one gather index per (row-group, 128-px
    block), each fetching a [ky, C, 2 chunks] slab (minor dim fully
    covered -> native)."""
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(2, 3, 4, 5),
        collapsed_slice_dims=(),
        start_index_map=(1, 3),
        operand_batching_dims=(0,),
        start_indices_batching_dims=(0,),
    )
    return jax.lax.gather(
        img_c5, starts, dnums, slice_sizes=(1, ky, c, 3, 128),
        mode=jax.lax.GatherScatterMode.CLIP,
    )


def _banded_chunk_fwd(img_f, coords_c, b, h, w, c, gy, ky, fold_depth):
    from .pallas.warp_band import banded_warp_rows

    dc = coords_c.shape[1]
    x_r, dyr_r, fy_r, starts, d_shared, hg = _banded_prep(
        coords_c, b, h, w, gy, ky, fold_depth)
    bands = _band_gather(img_f, starts, ky, c * w)
    bands = bands.reshape(-1, ky * c, w)
    out = banded_warp_rows(bands, x_r, dyr_r, fy_r, c, gy, ky, w,
                           d_shared=d_shared, hg=hg)  # [C, NBROWS, gy, W]
    # C-MAJOR return: the kernel's natural output layout, consumed as-is by
    # StageNet's C-major correlation — the [C, B*D*N] -> [B, D, C, N]
    # transpose this replaced cost ~7 ms/stage on the r3b eval trace
    return out.reshape(c, b, dc, h * w)  # [C, B, Dc, N]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7))
def _banded_stopgrad(img, coords, gy, ky, fold_depth, band_budget,
                     fused=False, wpad=False):
    """Banded-matmul sampler with gradient-stopped coordinates (the
    reference-default no_grad warp grid). Forward AND backward avoid
    per-sample index traffic entirely: the backward is the transposed
    one-hot matmuls (ops/pallas/warp_band.py) plus ky native row
    scatter-adds with one index per band — replacing the per-sample
    4C-window scatter that ran at 1 GB/s (~270 ms) in the r3 train profile.
    """
    return _banded_impl(img, coords, gy, ky, fold_depth, band_budget,
                        fused, wpad)


def _banded_blocked_fwd(img_l5, coords_c, b, h, w, c, gy, ky,
                        fused: bool = False, src_nj: int = 0):
    """img_l5: [B, H, C, W/128, 128] (gather path) or [B, H, W/128, C, 128]
    (fused path — the chunk dim must sit outside the tiled (C, 128) minor
    pair so the kernel's 3-chunk DMA slice is legal). src_nj: source chunk
    count when padded wider than the output grid (see _banded_blocked_prep)."""
    from .pallas.warp_band import (banded_warp_blocked,
                                   banded_warp_blocked_fused)

    dc = coords_c.shape[1]
    x_rel, dyr_r, fy_r, starts, starts3 = _banded_blocked_prep(
        coords_c, b, h, w, gy, ky, src_nj=src_nj)
    if fused:
        # bands DMA'd in-kernel straight from the image (HBM): no [NB,
        # ky*C, BW] band tensor, ~3x less band traffic (gather read +
        # write + kernel read-back -> one read)
        out = banded_warp_blocked_fused(
            img_l5, starts3, x_rel, dyr_r, fy_r, c, gy, ky, w)
        return out.reshape(c, b, dc, h * w)
    bands = _band_gather_blocked(img_l5, starts, ky, c)
    bands = bands.reshape(-1, ky * c, 384)
    out = banded_warp_blocked(bands, x_rel, dyr_r, fy_r, c, gy, ky, w)
    return out.reshape(c, b, dc, h * w)  # C-major [C, B, Dc, N]


def _banded_impl(img, coords, gy, ky, fold_depth, band_budget,
                 fused=False, wpad=False):
    b, h, w, c = img.shape
    d = coords.shape[1]
    hg = h // gy
    assert h % gy == 0 and ky <= h, (h, gy, ky)

    blocked = (not fold_depth) and w % 128 == 0 and w >= 384
    if (not blocked) and wpad and not fold_depth:
        # W-PADDED blocked variant for narrow crops (the train stage-2/3
        # 128x160 / 256x320 class, where W < 384 forces the whole-row path
        # and its taller ky): pad the OUTPUT grid to a 128 multiple (dummy
        # coords produce zeros, sliced off below) and the SOURCE width to
        # >= 384 zero columns so the 3-chunk windows are always legal —
        # samples landing in the pad read zeros, which IS the out-of-FOV
        # semantics. Trades up to 2.4x padded compute for the blocked
        # fused kernel's short-ky MXU plan; see
        # docs/profiles/r5 ablation rows before relying on it.
        wg = ((w + 127) // 128) * 128
        ws = max(384, wg)
        img_p = jnp.pad(img, ((0, 0), (0, 0), (0, ws - w), (0, 0)))
        coords_p = jnp.pad(
            coords, ((0, 0), (0, 0), (0, 0), (0, wg - w), (0, 0)),
            constant_values=-1e4)
        if fused:
            img_c5 = jnp.transpose(
                img_p.reshape(b, h, ws // 128, 128, c), (0, 1, 2, 4, 3))
        else:
            img_c5 = jnp.transpose(img_p, (0, 1, 3, 2)).reshape(
                b, h, c, ws // 128, 128)
        out = _banded_blocked_fwd(img_c5, coords_p, b, h, wg, c, gy, ky,
                                  fused, src_nj=ws // 128)
        return out.reshape(c, b, d, h, wg)[..., :w].reshape(c, b, d, h * w)
    if blocked:
        # per-(group, 128-px block) bands: sound under epipolar tilt.
        # Gather path wants [B, H, C, W/128, 128] (minor dims fully
        # covered by the slab slice); fused-DMA path wants the chunk dim
        # OUTSIDE the tiled (C, 128) pair: [B, H, W/128, C, 128].
        if fused:
            img_c5 = jnp.transpose(
                img.reshape(b, h, w // 128, 128, c), (0, 1, 2, 4, 3))
        else:
            img_c5 = jnp.transpose(img, (0, 1, 3, 2)).reshape(
                b, h, c, w // 128, 128)
        # budget models the GATHER form's materialized [NB, ky*C, 384] band
        # tensor; the fused-DMA kernel streams slabs in-kernel and holds
        # only coords, so it never needs the lax.map chunking (stage-3 DTU
        # eval: the budget-forced 2-chunk map cost ~23 ms of while-loop
        # overhead on the r4a trace)
        bytes_per_d = (0 if fused else
                       b * hg * (w // 128) * ky * c * 384 * img.dtype.itemsize)
        dc = max(1, min(d, band_budget // max(1, bytes_per_d)))
        while d % dc:
            dc -= 1
        if dc == d:
            return _banded_blocked_fwd(img_c5, coords, b, h, w, c, gy, ky,
                                       fused)
        chunks = jnp.moveaxis(coords.reshape(b, d // dc, dc, h, w, 2), 1, 0)
        out = jax.lax.map(
            lambda cc: _banded_blocked_fwd(img_c5, cc, b, h, w, c, gy, ky,
                                           fused),
            chunks)  # [nc, C, B, dc, N]
        return jnp.moveaxis(out, 0, 2).reshape(c, b, d, h * w)

    # whole-row bands (narrow images where 128-blocks don't divide W): only
    # sound when the per-row in-image v-span fits ky — true for the narrow
    # coarse-stage rows this path serves (see banded_escape_fraction)
    # [B, H, C, W] flattened: a band row is one contiguous [C*W] run and the
    # kernel's [ky*C, W] layout is a pure reshape of the gathered [ky, C*W]
    img_f = jnp.transpose(img, (0, 1, 3, 2)).reshape(b, h, c * w)

    if fold_depth:
        return _banded_chunk_fwd(img_f, coords, b, h, w, c, gy, ky, True)

    bytes_per_d = b * hg * ky * c * w * img.dtype.itemsize
    dc = max(1, min(d, band_budget // max(1, bytes_per_d)))
    while d % dc:
        dc -= 1
    if dc == d:
        return _banded_chunk_fwd(img_f, coords, b, h, w, c, gy, ky, False)
    chunks = jnp.moveaxis(
        coords.reshape(b, d // dc, dc, h, w, 2), 1, 0)
    out = jax.lax.map(
        lambda cc: _banded_chunk_fwd(img_f, cc, b, h, w, c, gy, ky, False),
        chunks)  # [nc, C, B, dc, N]
    return jnp.moveaxis(out, 0, 2).reshape(c, b, d, h * w)


def _banded_stopgrad_fwd(img, coords, gy, ky, fold_depth, band_budget,
                         fused=False, wpad=False):
    out = _banded_stopgrad(img, coords, gy, ky, fold_depth, band_budget,
                           fused, wpad)
    return out, (coords, jnp.zeros((0,) + img.shape, img.dtype))


def _banded_blocked_bwd(ct_cm, coords_c, b, h, w, c, gy, ky):
    """Blocked-banded image gradient: the exact transpose of the blocked
    forward's per-(row-group, 128-px-block) window geometry. Returns
    [B, H, C, W] f32. One scatter-add of [ky, C, BW] slabs (NBb indices)
    replaces the whole-row path's ky sequential row scatters."""
    from .pallas.warp_band import banded_warp_blocked_bwd

    dc = coords_c.shape[1]
    x_rel, dyr_r, fy_r, starts, _ = _banded_blocked_prep(
        coords_c, b, h, w, gy, ky)
    hg = h // gy
    nj = w // 128
    g = ct_cm.astype(jnp.float32).reshape(c, b * dc * hg, gy, w)
    dbands = banded_warp_blocked_bwd(
        g, x_rel, dyr_r, fy_r, c, gy, ky, w)   # [NBb_total, ky*C, 384]
    nbb = dc * hg * nj
    # chunk-aligned slab scatter: operand [B, H, W/128, C, 128] — the
    # chunk dim sits OUTSIDE the tiled (C, 128) minor pair so the 3-chunk
    # update window never splits a tile (indices are (row, chunk)). With
    # the chunk dim inside the tiled pair the same scatter moved 16.9 GB
    # for 2 GB of updates (sublane-padded RMW, 47.7 ms at the stage-4
    # train protocol); the unaligned [ky, C, 384]-window form on
    # [B, H, C, W] was 51.7 ms; a ky-loop of per-row scatters 703 ms
    # (per-op scatter overhead at [C, BW] size).
    upd = jnp.transpose(dbands.reshape(b, nbb, ky, c, 3, 128),
                        (0, 1, 2, 4, 3, 5))        # [.., ky, 3, C, 128]
    idx = starts  # (row, chunk)
    dn = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(2, 3, 4, 5),  # (ky, 3 chunks, C, 128) windows
        inserted_window_dims=(),
        scatter_dims_to_operand_dims=(1, 2),
        operand_batching_dims=(0,),
        scatter_indices_batching_dims=(0,),
    )
    acc = jax.lax.scatter_add(
        jnp.zeros((b, h, w // 128, c, 128), jnp.float32), idx, upd, dn,
        mode=jax.lax.GatherScatterMode.CLIP)
    # [B, H, W/128, C, 128] -> [B, H, C, W]
    return jnp.transpose(acc, (0, 1, 3, 2, 4)).reshape(b, h, c, w)


def banded_image_grad(ct_cm, coords, shape, dtype, gy: int = 8,
                      ky: int = 48, fold_depth: bool = False,
                      whole_row_ky_floor: int = 48):
    """dL/dimg of ANY gradient-stopped warp via the banded matmul transpose.

    ct_cm: C-major cotangent [C, B, D, N]. The backward is an independent
    linear map, so its window geometry need not match the forward's:

    - wide rows (W % 128 == 0, W >= 384, unfolded): the BLOCKED transpose
      — per-(row-group, 128-px-block) bands with the production ky=16
      window (zero escapes at the DTU eval AND train-crop geometries,
      tests/test_fold_window.py) and ONE slab scatter-add. The whole-row
      form at these widths needs ky=48 (row-wide v-span ~33 at stage-4
      train crops) — 3x the contraction rows and ky sequential row
      scatters (r4t trace: stage-4 bwd 37.4 ms kernel + 23.7 slice +
      19.6 scatter; stage-3 55.7 + 19.4 + 14.1).
    - narrow rows: WHOLE-ROW bands, floored at `whole_row_ky_floor`
      (default 48 — safe for any caller). The DTU-validated StageNet path
      passes 24 explicitly (row-wide v-spans at the train-crop stages
      measure <= 16 in-image rows, escape diagnostics at the DTU protocol
      geometry; 24 keeps a 50% margin and 2x fewer contraction rows).
      Validate new datasets with tools/validate_warp_windows.py before
      lowering the floor.

    Samples outside the window get zero gradient — the out-of-FOV class.
    This replaces the per-sample 4C-window scatter-add (1 GB/s,
    ~270 ms/step in the r3 profile) for every stop-grad warp path that
    calls it.
    """
    from .pallas.warp_band import banded_warp_rows_bwd

    b, h, w, c = shape
    d = coords.shape[1]
    blocked = ((not fold_depth) and w % 128 == 0 and w >= 384
               and h % gy == 0)
    if blocked:
        # per-block window height: the forward's ky when it came from a
        # blocked forward (16 at the production plans), clamped to the
        # [16, 24] range the escape pins cover — 24 holds even the
        # strongly-tilted geometry class where whole-row bands break
        # (tests/test_grid_sample.py test_banded_blocked_path_matches_plain)
        bky = min(h, max(16, min(ky, 24)))
        dimg_c = _banded_blocked_bwd(ct_cm.astype(jnp.float32), coords,
                                     b, h, w, c, gy, bky)
        return jnp.transpose(dimg_c, (0, 1, 3, 2)).astype(dtype)
    ky = min(max(ky, whole_row_ky_floor), h)
    x_r, dyr_r, fy_r, starts, d_shared, hg = _banded_prep(
        coords, b, h, w, gy, ky, fold_depth)
    g = ct_cm.astype(jnp.float32).reshape(c, b * d * hg, gy, w)
    dbands = banded_warp_rows_bwd(
        g, x_r, dyr_r, fy_r, c, gy, ky, w, d_shared=d_shared, hg=hg)
    nb = starts.shape[1]
    dimg_f = _band_scatter(
        dbands.reshape(b, nb, ky, c * w), starts, b, h, c * w, ky)
    return jnp.transpose(dimg_f.reshape(b, h, c, w),
                         (0, 1, 3, 2)).astype(dtype)


def _banded_stopgrad_bwd(gy, ky, fold_depth, band_budget, fused, wpad,
                         res, ct):
    coords, ex = res
    shape, dtype = ex.shape[1:], ex.dtype
    # ct arrives C-major [C, B, D, N] — the kernel's own output layout.
    # whole_row_ky_floor=24: this path only runs when the banded FORWARD
    # ran, whose window plan the caller validated (StageNet auto plans are
    # escape-pinned at DTU geometry, tests/test_fold_window.py;
    # tools/validate_warp_windows.py covers new datasets) — the same
    # validation covers the narrow-row backward at ky=24
    # (tests/test_fold_window.py test_bwd_window_escapes_at_train_geometry)
    dimg = banded_image_grad(ct, coords, shape, dtype, gy=gy, ky=ky,
                             fold_depth=fold_depth, whole_row_ky_floor=24)
    return dimg, jnp.zeros_like(coords)


_banded_stopgrad.defvjp(_banded_stopgrad_fwd, _banded_stopgrad_bwd)


def bilinear_sample_banded(img: Array, coords: Array, gy: int = 8,
                           ky: int = 16, fold_depth: bool = False,
                           band_budget: int = 1 << 30,
                           coord_grad: bool = False,
                           fused: bool = False,
                           wpad: bool = False) -> Array:
    """Banded-matmul warp sampler (see ops/pallas/warp_band.py): full-width
    source row-bands fetched with one gather index per row-group, x-selection
    as exact bf16 one-hot matmuls on the MXU, y-lerp as fp32 masked MACs.

    Bit-exact vs the per-sample path wherever the sample's corner rows fit
    the [ky] band window (|dv/dy| <= (ky-2)/(gy-1), the y-grouped guarantee);
    there is NO x-window in this formulation. fold_depth shares one (taller:
    callers raise ky) band across all D hypotheses — re-centered fine-stage
    bands only.

    Returns C-MAJOR [C, B, D, H*W] fp32 — the kernel's natural layout,
    consumed directly by StageNet's C-major correlation (unlike the other
    grouped samplers' [B, D, C, N]).
    """
    if coord_grad:
        b, d, h, w = coords.shape[:4]
        warped = bilinear_sample(img, coords)
        return jnp.moveaxis(warped, -1, 0).reshape(-1, b, d, h * w)
    return _banded_stopgrad(img, coords, gy, ky, fold_depth, band_budget,
                            fused, wpad)


def homography_warp_banded(
    src_feat: Array,
    src_proj: Array,
    ref_proj: Array,
    depth_values: Array,
    gy: int = 8,
    ky: int = 16,
    fold_depth: bool = False,
    band_budget: int = 1 << 30,
    fused: bool = False,
    wpad: bool = False,
):
    """Plane-sweep warp through the banded-matmul sampler.

    Same contract as homography_warp_ygrouped: returns
    (warped [B, D, C, H*W] fp32, None) — out-of-FOV samples are zero by
    construction (one-hot selectors never match out-of-range coordinates).
    """
    b, h, w, _ = src_feat.shape
    coords, _ = plane_sweep_coords(src_proj, ref_proj, depth_values, h, w)
    coords = jax.lax.stop_gradient(coords)
    return bilinear_sample_banded(
        src_feat, coords, gy=gy, ky=ky, fold_depth=fold_depth,
        band_budget=band_budget, fused=fused, wpad=wpad), None
