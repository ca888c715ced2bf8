"""Non-causal flash attention as a Pallas TPU kernel.

Replaces the reference's CUDA FlashAttention-2 dependency
(models/dino/layers/attention.py:141-170, 227-258) for the cost-volume (CTA)
blocks and any softmax-attention path long enough to matter. Design:

- grid (B·H, N/bn); each program owns one query block and streams key/value
  blocks through VMEM with the classic online-softmax recurrence (running
  max m, normalizer l, un-normalized accumulator acc);
- logits are computed on the MXU in fp32 (`preferred_element_type`);
- the custom softmax scale (entropy invariance) is folded into q once;
- head_dim is zero-padded to the 128-lane width outside the kernel; padding
  columns contribute 0 to q·kᵀ so the math is unchanged.

Backward runs through jax.custom_vjp recomputation (flash-style): we save
q, k, v and the per-row logsumexp, then recompute attention probabilities
blockwise for dq/dk/dv. For the first round the backward is expressed with
the same Pallas forward plus XLA einsums per block via lax.map; a fully
fused Pallas backward is an optimization slot.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

NEG_INF = -1e30


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, m_scratch, l_scratch, acc_scratch,
                *, bm: int, seq_m: int):
    """One (batch·head, q-block) program; grid dim 2 iterates k/v blocks.

    q_ref: [bn, d], k_ref/v_ref: [bm, d] (current k/v block), o_ref: [bn, d].
    seq_m: true (unpadded) key-sequence length; logits for padded key rows are
    masked to -inf so they take no probability mass.
    """
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, NEG_INF)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    q = q_ref[0]  # [bn, d] (pre-scaled)
    k = k_ref[0]  # [bm, d]
    v = v_ref[0]  # [bm, d]

    # NOTE: no `precision=` here — Mosaic rejects HIGHEST-precision matmuls
    # ("Bad lhs type": it lowers f32 HIGHEST to a bf16 multi-pass form); the
    # f32 accumulate via preferred_element_type is what matters.
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )  # [bn, bm]

    if seq_m % bm != 0:
        # only the final key block actually contains padding; the compare is
        # cheap enough to run unconditionally
        col = kb * bm + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < seq_m, s, NEG_INF)

    m_prev = m_scratch[:]  # [bn, 128] (broadcast lanes)
    l_prev = l_scratch[:]
    m_cur = jnp.max(s, axis=1, keepdims=True)  # [bn, 1]
    m_next = jnp.maximum(m_prev, jnp.broadcast_to(m_cur, m_prev.shape))

    p = jnp.exp(s - m_next[:, :1])  # [bn, bm]
    alpha = jnp.exp(m_prev - m_next)  # [bn, 128]
    l_next = l_prev * alpha + jnp.broadcast_to(
        jnp.sum(p, axis=1, keepdims=True), l_prev.shape
    )

    acc_scratch[:] = acc_scratch[:] * alpha[:, :1] + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_scratch[:] = m_next
    l_scratch[:] = l_next

    @pl.when(kb == pl.num_programs(2) - 1)
    def _finish():
        o_ref[0] = (acc_scratch[:] / l_scratch[:, :1]).astype(o_ref.dtype)


def _pad_to(x: Array, size: int, axis: int) -> Array:
    pad = size - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnames=("scale", "bn", "bm"))
def _flash_fwd(q: Array, k: Array, v: Array, scale: float, bn: int, bm: int) -> Array:
    """q: [BH, N, D], k/v: [BH, M, D] -> [BH, N, D]."""
    bh, n, d = q.shape
    m = k.shape[1]
    d_pad = max(128, _ceil_to(d, 128))
    n_pad = _ceil_to(n, bn)
    m_pad = _ceil_to(m, bm)

    qp = _pad_to(_pad_to(q * scale, n_pad, 1), d_pad, 2)
    kp = _pad_to(_pad_to(k, m_pad, 1), d_pad, 2)
    vp = _pad_to(_pad_to(v, m_pad, 1), d_pad, 2)

    grid = (bh, n_pad // bn, m_pad // bm)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, bm=bm, seq_m=m),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bn, d_pad), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, bm, d_pad), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, bm, d_pad), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, bn, d_pad), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, n_pad, d_pad), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bn, 128), jnp.float32),
            pltpu.VMEM((bn, 128), jnp.float32),
            pltpu.VMEM((bn, d_pad), jnp.float32),
        ],
        # CPU (tests / dryrun) has no Mosaic backend; interpret mode keeps the
        # same numerics so goldens validate the kernel logic off-TPU.
        interpret=jax.default_backend() not in ("tpu", "axon"),
    )(qp, kp, vp)
    return out[:, :n, :d]


def _attention_ref(q, k, v, scale):
    """fp32 reference attention used for the recompute-based VJP."""
    s = jnp.einsum("bnd,bmd->bnm", q.astype(jnp.float32) * scale, k.astype(jnp.float32))
    p = jax.nn.softmax(s, axis=-1)
    return p, jnp.einsum("bnm,bmd->bnd", p, v.astype(jnp.float32))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash3(q: Array, k: Array, v: Array, scale: float) -> Array:
    return _flash_fwd(q, k, v, scale, bn=512, bm=512)


def _flash3_fwd(q, k, v, scale):
    return _flash3(q, k, v, scale), (q, k, v)


def _flash3_bwd(scale, res, g):
    q, k, v = res
    # Recompute attention probabilities (chunked over query blocks to bound
    # memory) and form gradients with dense einsums. Training sequences are
    # ≤ ~12k tokens (train_avg_length regime); eval never calls backward.
    qf, kf, vf, gf = (t.astype(jnp.float32) for t in (q, k, v, g))

    def per_chunk(args):
        qc, gc = args
        s = jnp.einsum("bnd,bmd->bnm", qc * scale, kf)
        p = jax.nn.softmax(s, axis=-1)
        dv = jnp.einsum("bnm,bnd->bmd", p, gc)
        dp = jnp.einsum("bnd,bmd->bnm", gc, vf)
        dsum = jnp.sum(dp * p, axis=-1, keepdims=True)
        ds = p * (dp - dsum)
        dq = jnp.einsum("bnm,bmd->bnd", ds, kf) * scale
        dk = jnp.einsum("bnm,bnd->bmd", ds, qc) * scale
        return dq, dk, dv

    n = qf.shape[1]
    chunk = 2048
    if n <= chunk:
        dq, dk, dv = per_chunk((qf, gf))
    else:
        pad_n = _ceil_to(n, chunk)
        qp = _pad_to(qf, pad_n, 1).reshape(qf.shape[0], -1, chunk, qf.shape[2])
        gp = _pad_to(gf, pad_n, 1).reshape(gf.shape[0], -1, chunk, gf.shape[2])
        qp = jnp.moveaxis(qp, 1, 0)
        gp = jnp.moveaxis(gp, 1, 0)
        dqs, dks, dvs = jax.lax.map(per_chunk, (qp, gp))
        dq = jnp.moveaxis(dqs, 0, 1).reshape(qf.shape[0], pad_n, -1)[:, :n]
        dk = jnp.sum(dks, axis=0)
        dv = jnp.sum(dvs, axis=0)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_flash3.defvjp(_flash3_fwd, _flash3_bwd)


def flash_attention(q: Array, k: Array, v: Array, scale: float) -> Array:
    """Multi-head non-causal flash attention.

    q: [B, N, H, Dh], k/v: [B, M, H, Dh] -> [B, N, H, Dh].
    """
    b, n, h, dh = q.shape
    m = k.shape[1]
    qf = jnp.moveaxis(q, 2, 1).reshape(b * h, n, dh)
    kf = jnp.moveaxis(k, 2, 1).reshape(b * h, m, dh)
    vf = jnp.moveaxis(v, 2, 1).reshape(b * h, m, dh)
    out = _flash3(qf, kf, vf, scale)
    return jnp.moveaxis(out.reshape(b, h, n, dh), 1, 2)
