"""Pallas TPU kernel for the y-grouped plane-sweep blend.

Replaces the hot half of the reference's grid_sample warp
(models/warping.py:69-109, SURVEY §3.3 hot-loop #1). The pipeline is split:

- XLA does the index-bound PATCH GATHER: one [ky, wx] source patch per GY=8
  consecutive output pixels along Y (ops/grid_sample.py _ygrouped_prep — 8x
  fewer gather indices than per-sample gathering);
- this kernel does the bandwidth/layout-bound BLEND: expanding each patch
  into gy bilinearly-weighted output pixels.

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
tests/test_grid_sample.py and bit-exact vs the XLA blend on real TPU.

In-kernel patch transpose: native Mosaic transposes per 384-column chunk
(an identity-matrix MXU matmul also works but runs at default matmul
precision, quantizing f32 patches to bf16 — measured 8e-3 error on real
hardware). Cell channels are then SUBLANE slices of the f32 chunk (aligned
for C % 4 == 0; f32 sublane tile is 8).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

Array = jax.Array

_CHUNK = 384  # transpose chunk: 3 * 128 lanes; divides ky*wx*C for C % 4 == 0


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
    """One (row-group, x-block) program: patch [PBX, ky*wx*C] ->
    out [C, GY, PBX] (8 consecutive output rows x PBX columns)."""
    kc = ky * wx * c
    dy = dy_ref[0]  # [GY, PBX] (weights arrive as [1, GY, PBX] row blocks)
    fy = fy_ref[0]
    wxs = _col_weights(dx_ref[0], fx_ref[0], wx)

    acc = jnp.zeros((c, dy.shape[0], dy.shape[1]), jnp.float32)
    for j in range(kc // _CHUNK):
        # [CHUNK, PBX] f32: native Mosaic transpose (an identity MXU matmul
        # would run at default precision and quantize f32 patches to bf16)
        chunk_t = patch_ref[:, j * _CHUNK:(j + 1) * _CHUNK].astype(
            jnp.float32).T
        for cell in range(_CHUNK // c):
            flat = j * (_CHUNK // c) + cell  # = yy * wx + xx
            yy, xx = flat // wx, flat % wx
            wgt = jnp.where(dy == yy, 1 - fy,
                            jnp.where(dy == yy - 1, fy, 0.0)) * wxs[xx]
            cell_t = chunk_t[cell * c:(cell + 1) * c, :]  # [C, PBX]
            acc = acc + cell_t[:, None, :] * wgt[None]
    out_ref[:] = acc


def _bwd_kernel(g_ref, dx_ref, dy_ref, fx_ref, fy_ref, dpatch_ref,
                *, c: int, ky: int, wx: int):
    """dpatch [PBX, ky*wx*C] from dout [C, GY, PBX] (blend linear in patch)."""
    kc = ky * wx * c
    dy = dy_ref[0]
    fy = fy_ref[0]
    wxs = _col_weights(dx_ref[0], fx_ref[0], wx)
    g = g_ref[:]  # [C, GY, PBX] f32

    for j in range(kc // _CHUNK):
        rows = []
        for cell in range(_CHUNK // c):
            flat = j * (_CHUNK // c) + cell
            yy, xx = flat // wx, flat % wx
            wgt = jnp.where(dy == yy, 1 - fy,
                            jnp.where(dy == yy - 1, fy, 0.0)) * wxs[xx]
            rows.append(jnp.sum(g * wgt[None], axis=1))  # [C, PBX]
        chunk_t = jnp.concatenate(rows, axis=0)  # [CHUNK, PBX]
        dpatch_ref[:, j * _CHUNK:(j + 1) * _CHUNK] = chunk_t.T.astype(
            dpatch_ref.dtype)


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
      patch: [P, ky*wx*C] gathered patches (bf16 or f32), one per group of
        gy consecutive output-Y pixels; P = B*D*(H/gy)*W ordered (b,d,hg,x).
      dx/dy/fx/fy: [ROWS=P/W, GY, W] f32 — integer corner offset inside the
        patch window and bilinear fraction per output pixel
        (dx = x0 - anchor_x). 3D so the lane block can span W exactly when
        W is not a 128-multiple (Mosaic block divisibility rule).
      c: channels; gy: pixels per group; ky/wx: patch window; w: row width.

    Returns [C, P/W*GY, W] f32 — i.e. [C, B*D*H, W], natural pixel order.
    """
    return _blend_fwd_impl(patch, dx, dy, fx, fy, c, gy, ky, wx, w)


def _blend_fwd_impl(patch, dx, dy, fx, fy, c, gy, ky, wx, w):
    p = patch.shape[0]
    kc = ky * wx * c
    assert kc % _CHUNK == 0, f"ky*wx*C={kc} not a multiple of {_CHUNK}"
    assert p % w == 0
    pbx = _pbx_for(w)
    rows = p // w  # = B*D*Hg

    out = pl.pallas_call(
        functools.partial(_fwd_kernel, c=c, ky=ky, wx=wx),
        grid=(rows, w // pbx),
        in_specs=[
            pl.BlockSpec((pbx, kc), lambda i, j: (i * (w // pbx) + j, 0)),
        ] + [pl.BlockSpec((1, gy, pbx), lambda i, j: (i, 0, j))] * 4,
        out_specs=pl.BlockSpec((c, gy, pbx), lambda i, j: (0, i, j)),
        out_shape=jax.ShapeDtypeStruct((c, rows * gy, w), jnp.float32),
        interpret=_interpret(),
    )(patch, dx, dy, fx, fy)
    return out


def _blend_fwd(patch, dx, dy, fx, fy, c, gy, ky, wx, w):
    # residuals must be JAX types: carry patch's dtype via an empty exemplar
    return _blend_fwd_impl(patch, dx, dy, fx, fy, c, gy, ky, wx, w), (
        jnp.zeros((0,), patch.dtype), dx, dy, fx, fy)


def _blend_bwd(c, gy, ky, wx, w, res, g):
    pex, dx, dy, fx, fy = res
    rows, kc = dx.shape[0], ky * wx * c
    p = rows * w
    pbx = _pbx_for(w)

    dpatch = pl.pallas_call(
        functools.partial(_bwd_kernel, c=c, ky=ky, wx=wx),
        grid=(rows, w // pbx),
        in_specs=[
            pl.BlockSpec((c, gy, pbx), lambda i, j: (0, i, j)),
        ] + [pl.BlockSpec((1, gy, pbx), lambda i, j: (i, 0, j))] * 4,
        out_specs=pl.BlockSpec((pbx, kc), lambda i, j: (i * (w // pbx) + j, 0)),
        out_shape=jax.ShapeDtypeStruct((p, kc), pex.dtype),
        interpret=_interpret(),
    )(g.astype(jnp.float32), dx, dy, fx, fy)
    return (dpatch, None, None, None, None)


blend_ygrouped.defvjp(_blend_fwd, _blend_bwd)
