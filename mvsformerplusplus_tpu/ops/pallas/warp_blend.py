"""Pallas TPU kernel for the y-grouped plane-sweep blend.

Replaces the hot half of the reference's grid_sample warp
(models/warping.py:69-109, SURVEY §3.3 hot-loop #1). The pipeline is split:

- XLA does the index-bound PATCH GATHER: one [ky, wx] source patch per GY=8
  consecutive output pixels along Y (ops/grid_sample.py
  bilinear_sample_ygrouped — 8x fewer gather indices than per-sample
  gathering). The gather slice spans the FULL minor dim of the operand
  ([B, W, H, wx*C], slice (1, 1, ky, wx*C)): XLA's TPU backend keeps
  full-minor-dim slices as a native gather, while ANY partial-minor slice is
  expanded to a while-loop of dynamic-slices (~10 s/map measured — the r2
  regression). The gather output is requested TRANSPOSED (offset_dims
  first, [ky, wx*C, N]) — the blend kernel's cell-major layout with the
  huge N dim minor. XLA lowers that to gather + transpose whose [N, ky,
  wx*C] temp is tile-padded (13.5 GB unchunked at DTU stage-4 scale), so
  the caller lax.map-chunks the depth axis to bound it; this still beats
  consuming the native [N, ky, wx*C] layout with in-kernel slab
  transposes (96 vs 143 ms at stage-4 scale).
- this kernel does the bandwidth-bound BLEND: expanding each patch into gy
  bilinearly-weighted output pixels.

Why Y-grouping (not X): a group's outputs must reassemble into natural
(H, W) pixel order. Grouping along X leaves the 8 group members strided in
the minor W axis, and every interleave strategy materializes a gx-minor
tensor that XLA layout assignment lane-pads 16x (the r1/r2 OOM class) —
in-kernel, Mosaic rejects the sublane->lane merge reshape outright
("unsupported shape cast"). Grouping along Y puts the 8 members on
CONSECUTIVE ROWS: the kernel's accumulator [C, GY, PBX] block-writes
directly into the output array [C, B*D*H, W] at row hg*8 — no relayout
anywhere, on either side of the pallas_call.

Blend math matches torch grid_sample(zeros, align_corners=True) semantics
exactly: corner weights are zeroed when the corner falls outside the patch
window or the image (the patch window is sized so in-image corners stay
inside for |dv/dy| <= (ky-2)/(gy-1) = 2 and |du/dy| <= (wx-2)/(gy-1) ~ 0.57;
beyond that — extreme epipolar slopes — samples degrade to zeros, the same
class as out-of-FOV). Parity-tested against the per-sample sampler in
tests/test_grid_sample.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

Array = jax.Array


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _col_weights(dx: Array, fx: Array, wx: int):
    """Per-x-window-offset weights (shared by every ky row)."""
    return [
        jnp.where(dx == i, 1 - fx, jnp.where(dx == i - 1, fx, 0.0))
        for i in range(wx)
    ]


def _fwd_kernel(patch_ref, dx_ref, dy_ref, fx_ref, fy_ref, out_ref,
                *, c: int, ky: int, wx: int):
    """One (row-group, x-block) program: patch [ky, wx*C, PBX] ->
    out [C, GY, PBX] (gy consecutive output rows x PBX columns).

    Patch cells arrive cell-major ([yy, xx*C:(xx+1)*C, :] is the [C, PBX]
    slab of window cell (yy, xx)) so each multiply-add reads a plain f32
    sublane slice — no transposes anywhere in the kernel."""
    dy = dy_ref[0]  # [GY, PBX] (weights arrive as [1, GY, PBX] row blocks)
    fy = fy_ref[0]
    wxs = _col_weights(dx_ref[0], fx_ref[0], wx)

    acc = jnp.zeros((c, dy.shape[0], dy.shape[1]), jnp.float32)
    for yy in range(ky):
        slab = patch_ref[yy].astype(jnp.float32)  # [wx*C, PBX]
        wy = jnp.where(dy == yy, 1 - fy, jnp.where(dy == yy - 1, fy, 0.0))
        for xx in range(wx):
            cell_t = slab[xx * c:(xx + 1) * c, :]  # [C, PBX]
            acc = acc + cell_t[:, None, :] * (wy * wxs[xx])[None]
    out_ref[:] = acc


def _bwd_kernel(g_ref, dx_ref, dy_ref, fx_ref, fy_ref, dpatch_ref,
                *, c: int, ky: int, wx: int):
    """dpatch [ky, wx*C, PBX] from dout [C, GY, PBX] (blend linear in patch)."""
    dy = dy_ref[0]
    fy = fy_ref[0]
    wxs = _col_weights(dx_ref[0], fx_ref[0], wx)
    g = g_ref[:]  # [C, GY, PBX] f32

    for yy in range(ky):
        wy = jnp.where(dy == yy, 1 - fy, jnp.where(dy == yy - 1, fy, 0.0))
        rows = [
            jnp.sum(g * (wy * wxs[xx])[None], axis=1)  # [C, PBX]
            for xx in range(wx)
        ]
        dpatch_ref[yy] = jnp.concatenate(rows, axis=0).astype(dpatch_ref.dtype)


def _pbx_for(w: int, cap: int = 512) -> int:
    """Largest 128-multiple divisor of w (<= cap); whole-W when none exists
    (Mosaic requires lane blocks divisible by 128 or spanning the axis)."""
    for cand in range(min(cap, w) // 128 * 128, 0, -128):
        if w % cand == 0:
            return cand
    return w


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def blend_ygrouped(patch: Array, dx: Array, dy: Array, fx: Array, fy: Array,
                   c: int, gy: int, ky: int, wx: int, w: int) -> Array:
    """Expand gathered patches into bilinear samples, TPU-layout-safe.

    Args:
      patch: [ky, wx*C, P] gathered patches (bf16 or f32), cell-major with
        the huge P dim minor — one [ky, wx*C] window per group of gy
        consecutive output-Y pixels; P = B*D*(H/gy)*W ordered (b, d, hg, x).
      dx/dy/fx/fy: [ROWS=P/W, GY, W] f32 — integer corner offset inside the
        patch window and bilinear fraction per output pixel
        (dx = x0 - anchor_x). 3D so the lane block can span W exactly when
        W is not a 128-multiple (Mosaic block divisibility rule).
      c: channels; gy: pixels per group; ky/wx: patch window; w: row width.

    Returns [C, P/W*GY, W] f32 — i.e. [C, B*D*H, W], natural pixel order.
    """
    return _blend_fwd_impl(patch, dx, dy, fx, fy, c, gy, ky, wx, w)


def _blend_fwd_impl(patch, dx, dy, fx, fy, c, gy, ky, wx, w):
    p = patch.shape[-1]
    assert patch.shape[:2] == (ky, wx * c), patch.shape
    assert p % w == 0
    pbx = _pbx_for(w)
    rows = p // w  # = B*D*Hg

    out = pl.pallas_call(
        functools.partial(_fwd_kernel, c=c, ky=ky, wx=wx),
        grid=(rows, w // pbx),
        in_specs=[
            pl.BlockSpec((ky, wx * c, pbx),
                         lambda i, j: (0, 0, i * (w // pbx) + j)),
        ] + [pl.BlockSpec((1, gy, pbx), lambda i, j: (i, 0, j))] * 4,
        out_specs=pl.BlockSpec((c, gy, pbx), lambda i, j: (0, i, j)),
        out_shape=jax.ShapeDtypeStruct((c, rows * gy, w), jnp.float32),
        interpret=_interpret(),
    )(patch, dx, dy, fx, fy)
    return out


def blend_ygrouped_dfold(patch: Array, dx: Array, dy: Array, fx: Array,
                         fy: Array, c: int, gy: int, ky: int, wx: int,
                         w: int, d: int, hg: int) -> Array:
    """Depth-FOLDED y-grouped blend: one gathered patch per (row-group, x)
    serves gy consecutive output rows x ALL D depth hypotheses.

    Fine cascade stages' hypothesis bands are re-centered and narrow
    (ops/sampling.py schedule_inverse_range), so the epipolar footprint of
    the whole band fits a modestly wider window (ky~24, wx~12 vs 16x6):
    gather index count drops by another factor of D on top of the gy
    grouping (stage 4 DTU eval: 0.88M -> 0.22M per source view; gathers are
    index-bound) and the patch is fetched once per group instead of once
    per (group, depth).

    Args:
      patch: [ky, wx*C, B*Hg*W] — ONE patch per pixel-group, shared by all
        D depths (cell-major, huge minor dim; see blend_ygrouped).
      dx/dy/fx/fy: [B*D*Hg, GY, W] f32, rows ordered (b, d, hg) — offsets
        are relative to the SHARED per-group anchor.
      d: depth hypotheses sharing each patch; hg: row-groups per image.

    Returns [C, B*D*H, W] f32, natural (b, d, h) row order.

    Grid (B*Hg, W/PBX, D): the depth axis iterates INNERMOST, so the patch
    block's index is unchanged across consecutive steps and Pallas keeps it
    resident in VMEM — D blends per patch fetch. Same kernel body as the
    unfolded path (the blend math is anchor-relative either way). Forward
    only: the production warp's backward goes through the per-sample
    transpose (grid_sample._ygrouped_stopgrad), never through this kernel.
    """
    p = patch.shape[-1]
    assert patch.shape[:2] == (ky, wx * c), patch.shape
    assert p % w == 0
    b_hg = p // w                     # B * Hg
    rows_w = dx.shape[0]              # B * D * Hg
    assert rows_w == b_hg * d, (rows_w, b_hg, d)
    pbx = _pbx_for(w)
    nj = w // pbx

    def row_of(i, dd):
        # weight/output row for (b, d, hg): i = b*Hg + hg
        return (i // hg) * (d * hg) + dd * hg + (i % hg)

    return pl.pallas_call(
        functools.partial(_fwd_kernel, c=c, ky=ky, wx=wx),
        grid=(b_hg, nj, d),
        in_specs=[
            pl.BlockSpec((ky, wx * c, pbx),
                         lambda i, j, dd: (0, 0, i * nj + j)),
        ] + [pl.BlockSpec((1, gy, pbx),
                          lambda i, j, dd: (row_of(i, dd), 0, j))] * 4,
        out_specs=pl.BlockSpec((c, gy, pbx),
                               lambda i, j, dd: (0, row_of(i, dd), j)),
        out_shape=jax.ShapeDtypeStruct((c, rows_w * gy, w), jnp.float32),
        interpret=_interpret(),
    )(patch, dx, dy, fx, fy)


def _blend_fwd(patch, dx, dy, fx, fy, c, gy, ky, wx, w):
    # residuals must be JAX types: carry patch's dtype via an empty exemplar
    return _blend_fwd_impl(patch, dx, dy, fx, fy, c, gy, ky, wx, w), (
        jnp.zeros((0,), patch.dtype), dx, dy, fx, fy)


def _blend_bwd(c, gy, ky, wx, w, res, g):
    pex, dx, dy, fx, fy = res
    rows = dx.shape[0]
    p = rows * w
    pbx = _pbx_for(w)

    dpatch = pl.pallas_call(
        functools.partial(_bwd_kernel, c=c, ky=ky, wx=wx),
        grid=(rows, w // pbx),
        in_specs=[
            pl.BlockSpec((c, gy, pbx), lambda i, j: (0, i, j)),
        ] + [pl.BlockSpec((1, gy, pbx), lambda i, j: (i, 0, j))] * 4,
        out_specs=pl.BlockSpec((ky, wx * c, pbx),
                               lambda i, j: (0, 0, i * (w // pbx) + j)),
        out_shape=jax.ShapeDtypeStruct((ky, wx * c, p), pex.dtype),
        interpret=_interpret(),
    )(g.astype(jnp.float32), dx, dy, fx, fy)
    return (dpatch, None, None, None, None)


blend_ygrouped.defvjp(_blend_fwd, _blend_bwd)
