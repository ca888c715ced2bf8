"""Pallas TPU kernel for the x-grouped plane-sweep blend.

Replaces the hot half of the reference's grid_sample warp
(models/warping.py:69-109, SURVEY §3.3 hot-loop #1). The pipeline is split:

- XLA does the index-bound PATCH GATHER (one [3, kx] source patch per gx
  consecutive ref pixels, ops/grid_sample.py bilinear_sample_xgrouped — 8x
  fewer gather indices than per-sample gathering);
- this kernel does the bandwidth/layout-bound BLEND: expanding each patch
  into gx bilinearly-weighted output pixels. In pure XLA the accumulator
  [B, D, C, GX, M] keeps getting a gx-minor layout from the compiler's
  layout assignment, which lane-pads it 16x on the (8, 128) tile and OOMs
  at DTU eval scale. Here every buffer's layout is pinned by construction:
  coords/weights live as [GX(sublane), P(lane)], patches as
  [P(sublane), 3·kx·C(lane)], output as [C, GX(sublane), P(lane)].

The blend math is identical to the XLA path (bilinear corner weights with
zero for corners outside the patch or image) and is parity-tested against it
and against the per-sample sampler in tests/test_grid_sample.py.

In-kernel patch transpose: native Mosaic transposes per 384-column chunk
(an identity-matrix MXU matmul also works but runs at default matmul
precision, quantizing f32 patches to bf16 — measured 8e-3 error on real
hardware). Cell channels are then SUBLANE slices of the f32 chunk (aligned
for C in {8, 16, 32, 64}; f32 sublane tile is 8).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_CHUNK = 384  # transpose chunk: 3 * 128 lanes; divides 3*kx*C for C >= 8


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _row_weights(dy: Array, fy: Array):
    """The 3 y-window weights shared by every kx column."""
    return [
        jnp.where(dy == r, 1 - fy, jnp.where(dy == r - 1, fy, 0.0))
        for r in range(3)
    ]


def _fwd_kernel(patch_ref, dx_ref, dy_ref, fx_ref, fy_ref, out_ref,
                *, c: int, kx: int):
    """One P-block: patch [PB, 3*kx*C] -> out [C, GX, PB]."""
    pb = patch_ref.shape[0]
    k3c = 3 * kx * c
    dx = dx_ref[:]
    fx = fx_ref[:]
    wy = _row_weights(dy_ref[:], fy_ref[:])

    acc = jnp.zeros((c, dx.shape[0], pb), jnp.float32)
    for j in range(k3c // _CHUNK):
        # [CHUNK, PB] f32: native Mosaic transpose (an identity MXU matmul
        # would run at default precision and quantize f32 patches to bf16)
        chunk_t = patch_ref[:, j * _CHUNK:(j + 1) * _CHUNK].astype(
            jnp.float32).T
        for cell in range(_CHUNK // c):
            flat = j * (_CHUNK // c) + cell  # = k * 3 + r
            k, r = flat // 3, flat % 3
            wgt = jnp.where(dx == k, 1 - fx,
                            jnp.where(dx == k - 1, fx, 0.0)) * wy[r]
            cell_t = chunk_t[cell * c:(cell + 1) * c, :]  # [C, PB]
            acc = acc + cell_t[:, None, :] * wgt[None]
    out_ref[:] = acc


def _bwd_kernel(g_ref, dx_ref, dy_ref, fx_ref, fy_ref, dpatch_ref,
                *, c: int, kx: int):
    """dpatch [PB, 3*kx*C] from dout [C, GX, PB] (blend is linear in patch)."""
    pb = g_ref.shape[2]
    k3c = 3 * kx * c
    dx = dx_ref[:]
    fx = fx_ref[:]
    wy = _row_weights(dy_ref[:], fy_ref[:])
    g = g_ref[:]  # [C, GX, PB] f32

    for j in range(k3c // _CHUNK):
        rows = []
        for cell in range(_CHUNK // c):
            flat = j * (_CHUNK // c) + cell
            k, r = flat // 3, flat % 3
            wgt = jnp.where(dx == k, 1 - fx,
                            jnp.where(dx == k - 1, fx, 0.0)) * wy[r]
            rows.append(jnp.sum(g * wgt[None], axis=1))  # [C, PB]
        chunk_t = jnp.concatenate(rows, axis=0)  # [CHUNK, PB]
        dpatch_ref[:, j * _CHUNK:(j + 1) * _CHUNK] = chunk_t.T.astype(
            dpatch_ref.dtype)


def _pad_p(x: Array, p_pad: int) -> Array:
    if x.shape[-1] == p_pad:
        return x
    pad = [(0, 0)] * (x.ndim - 1) + [(0, p_pad - x.shape[-1])]
    return jnp.pad(x, pad)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def blend_xgrouped(patch: Array, dx: Array, dy: Array, fx: Array, fy: Array,
                   c: int, gx: int, kx: int) -> Array:
    """Expand gathered patches into bilinear samples, TPU-layout-safe.

    Args:
      patch: [P, 3*kx*C] gathered patches (bf16 or f32), one per pixel group.
      dx/dy/fx/fy: [GX, P] f32 — integer corner offset inside the patch and
        bilinear fraction, per output pixel (dx = x0 - anchor_x etc.).
      c: channels; gx: pixels per group; kx: patch width.

    Returns [C, GX, P] f32 blended samples.
    """
    return _blend_fwd_impl(patch, dx, dy, fx, fy, c, gx, kx)


def _blend_fwd_impl(patch, dx, dy, fx, fy, c, gx, kx):
    p = patch.shape[0]
    k3c = 3 * kx * c
    assert k3c % _CHUNK == 0, f"3*kx*C={k3c} not a multiple of {_CHUNK}"
    pb = 512
    p_pad = -(-p // pb) * pb
    patch_p = jnp.pad(patch, ((0, p_pad - p), (0, 0))) if p != p_pad else patch
    coords = [_pad_p(a, p_pad) for a in (dx, dy, fx, fy)]

    out = pl.pallas_call(
        functools.partial(_fwd_kernel, c=c, kx=kx),
        grid=(p_pad // pb,),
        in_specs=[
            pl.BlockSpec((pb, k3c), lambda i: (i, 0)),
        ] + [pl.BlockSpec((gx, pb), lambda i: (0, i))] * 4,
        out_specs=pl.BlockSpec((c, gx, pb), lambda i: (0, 0, i)),
        out_shape=jax.ShapeDtypeStruct((c, gx, p_pad), jnp.float32),
        interpret=_interpret(),
    )(patch_p, *coords)
    return out[:, :, :p]


def _blend_fwd(patch, dx, dy, fx, fy, c, gx, kx):
    # residuals must be JAX types: carry patch's dtype via an empty exemplar
    return _blend_fwd_impl(patch, dx, dy, fx, fy, c, gx, kx), (
        jnp.zeros((0,), patch.dtype), dx, dy, fx, fy)


def _blend_bwd(c, gx, kx, res, g):
    pex, dx, dy, fx, fy = res
    pdtype = pex.dtype
    p, k3c = dx.shape[1], 3 * kx * c
    pb = 512
    p_pad = -(-p // pb) * pb
    g_p = _pad_p(g, p_pad)
    coords = [_pad_p(a, p_pad) for a in (dx, dy, fx, fy)]

    dpatch = pl.pallas_call(
        functools.partial(_bwd_kernel, c=c, kx=kx),
        grid=(p_pad // pb,),
        in_specs=[
            pl.BlockSpec((c, gx, pb), lambda i: (0, 0, i)),
        ] + [pl.BlockSpec((gx, pb), lambda i: (0, i))] * 4,
        out_specs=pl.BlockSpec((pb, k3c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((p_pad, k3c), pdtype),
        interpret=_interpret(),
    )(g_p.astype(jnp.float32), *coords)
    return (dpatch[:p], None, None, None, None)


blend_xgrouped.defvjp(_blend_fwd, _blend_bwd)
