"""Non-causal flash attention as Pallas TPU kernels (forward + fused VJP).

Replaces the reference's CUDA FlashAttention-2 dependency
(models/dino/layers/attention.py:141-170, 227-258) for the cost-volume (CTA)
blocks and any softmax-attention path long enough to matter. Design:

- forward: grid (B·H, N/bn, M/bm); each program owns one query block and
  streams key/value blocks through VMEM with the classic online-softmax
  recurrence (running max m, normalizer l, un-normalized accumulator acc);
  the per-row logsumexp is emitted as a second output for the backward;
- backward: two fused kernels in FA2 style — dK/dV (grid over key blocks,
  streaming query blocks) and dQ (grid over query blocks, streaming key
  blocks). Probabilities are rebuilt as exp(s - lse) from the SAVED
  logsumexp (no renormalization pass), and delta = rowsum(dO ⊙ O) is
  precomputed outside. Nothing [N, M]-shaped ever touches HBM;
- logits are computed on the MXU in fp32 (`preferred_element_type`);
- the custom softmax scale (entropy invariance) is folded into q once; the
  dK formula then needs no scale (dK = dSᵀ·(q·scale)) and dQ multiplies by
  scale once at the end;
- head_dim is zero-padded to the 128-lane width outside the kernel; padding
  columns contribute 0 to q·kᵀ so the math is unchanged.

head_dim=16 note (CTA: d_model 64 / 4 heads): the padded contraction
[bn,128]·[128,bm] is ONE MXU pass either way — K<=128 costs the same pass
count as K=16, so packing more heads into the lanes could only contaminate
the per-head softmax, not save passes. At dh=16 the kernel is VPU-bound
(the exp over [bn, bm] tiles), which padding does not touch. The 8x figure
is FLOP waste, not wall-clock waste.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

NEG_INF = -1e30


def _interpret() -> bool:
    # CPU (tests / dryrun) has no Mosaic backend; interpret mode keeps the
    # same numerics so goldens validate the kernel logic off-TPU.
    return jax.default_backend() not in ("tpu", "axon")


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref,
                m_scratch, l_scratch, acc_scratch, *, bm: int, seq_m: int):
    """One (batch·head, q-block) program; grid dim 2 iterates k/v blocks.

    q_ref: [bn, d], k_ref/v_ref: [bm, d] (current k/v block), o_ref: [bn, d],
    lse_ref: [bn, 128] (per-row logsumexp broadcast over lanes) — or None on
    the inference-only path (no backward -> the [BH, N, 128] fp32 lse write
    would be pure wasted HBM traffic; pallas outputs can't be DCE'd by XLA).
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
        if lse_ref is not None:
            lse_ref[0] = m_scratch[:] + jnp.log(l_scratch[:])


def _fwd_kernel_nolse(q_ref, k_ref, v_ref, o_ref,
                      m_scratch, l_scratch, acc_scratch, *, bm: int,
                      seq_m: int):
    _fwd_kernel(q_ref, k_ref, v_ref, o_ref, None,
                m_scratch, l_scratch, acc_scratch, bm=bm, seq_m=seq_m)


def _pad_to(x: Array, size: int, axis: int) -> Array:
    pad = size - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _flash_fwd(qs: Array, k: Array, v: Array, bn: int, bm: int,
               need_lse: bool = True):
    """qs: [BH, N, D] PRE-SCALED queries, k/v: [BH, M, D].

    Returns (out [BH, N, D], lse [BH, N_pad, 128] fp32) — lse is None when
    need_lse=False (the inference path skips its HBM write entirely).
    """
    bh, n, d = qs.shape
    m = k.shape[1]
    d_pad = max(128, _ceil_to(d, 128))
    n_pad = _ceil_to(n, bn)
    m_pad = _ceil_to(m, bm)

    qp = _pad_to(_pad_to(qs, n_pad, 1), d_pad, 2)
    kp = _pad_to(_pad_to(k, m_pad, 1), d_pad, 2)
    vp = _pad_to(_pad_to(v, m_pad, 1), d_pad, 2)

    grid = (bh, n_pad // bn, m_pad // bm)
    out_spec = pl.BlockSpec((1, bn, d_pad), lambda b, i, j: (b, i, 0))
    out_shape = jax.ShapeDtypeStruct((bh, n_pad, d_pad), qs.dtype)
    lse_spec = pl.BlockSpec((1, bn, 128), lambda b, i, j: (b, i, 0))
    lse_shape = jax.ShapeDtypeStruct((bh, n_pad, 128), jnp.float32)
    result = pl.pallas_call(
        functools.partial(
            _fwd_kernel if need_lse else _fwd_kernel_nolse, bm=bm, seq_m=m),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bn, d_pad), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, bm, d_pad), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, bm, d_pad), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=(out_spec, lse_spec) if need_lse else out_spec,
        out_shape=(out_shape, lse_shape) if need_lse else out_shape,
        scratch_shapes=[
            pltpu.VMEM((bn, 128), jnp.float32),
            pltpu.VMEM((bn, 128), jnp.float32),
            pltpu.VMEM((bn, d_pad), jnp.float32),
        ],
        interpret=_interpret(),
    )(qp, kp, vp)
    out, lse = result if need_lse else (result, None)
    return out[:, :n, :d], lse


def _bwd_dkv_kernel(q_ref, do_ref, lse_ref, delta_ref, k_ref, v_ref,
                    dk_ref, dv_ref, dk_acc, dv_acc, *, bn: int, seq_n: int):
    """grid (bh, M/bm, N/bn): one program per key/value block, streaming
    query blocks over the last grid axis.

    lse_ref/delta_ref: [8, bn] ROW layouts (value broadcast over sublanes) so
    they broadcast across the bm rows of the [bm, bn] transposed logits.
    """
    nb = pl.program_id(2)

    @pl.when(nb == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q = q_ref[0]       # [bn, d] (pre-scaled)
    do = do_ref[0]     # [bn, d]
    k = k_ref[0]       # [bm, d]
    v = v_ref[0]       # [bm, d]
    lse_row = lse_ref[0][0:1, :]      # [1, bn]
    delta_row = delta_ref[0][0:1, :]  # [1, bn]

    st = jax.lax.dot_general(  # s^T = k·qᵀ : [bm, bn]
        k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )
    if seq_n % bn != 0:
        col = nb * bn + jax.lax.broadcasted_iota(jnp.int32, st.shape, 1)
        st = jnp.where(col < seq_n, st, NEG_INF)
    pt = jnp.exp(st - lse_row)  # [bm, bn] (padded q rows: do == 0 kills them)

    dv_acc[:] = dv_acc[:] + jax.lax.dot_general(
        pt.astype(do.dtype), do, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dpt = jax.lax.dot_general(  # dPᵀ = v·dOᵀ : [bm, bn]
        v, do, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )
    dst = pt * (dpt - delta_row)  # [bm, bn]
    dk_acc[:] = dk_acc[:] + jax.lax.dot_general(
        dst.astype(q.dtype), q, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(nb == pl.num_programs(2) - 1)
    def _finish():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _bwd_dq_kernel(q_ref, do_ref, lse_ref, delta_ref, k_ref, v_ref,
                   dq_ref, dq_acc, *, bm: int, seq_m: int, scale: float):
    """grid (bh, N/bn, M/bm): one program per query block, streaming key
    blocks. lse_ref/delta_ref: [bn, 128] column layouts."""
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _init():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    q = q_ref[0]
    do = do_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    lse = lse_ref[0][:, 0:1]      # [bn, 1]
    delta = delta_ref[0][:, 0:1]  # [bn, 1]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )  # [bn, bm]
    if seq_m % bm != 0:
        col = kb * bm + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < seq_m, s, NEG_INF)
    p = jnp.exp(s - lse)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )  # [bn, bm]
    ds = p * (dp - delta)
    dq_acc[:] = dq_acc[:] + jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(kb == pl.num_programs(2) - 1)
    def _finish():
        # grad wrt the ORIGINAL (unscaled) q
        dq_ref[0] = (dq_acc[:] * scale).astype(dq_ref.dtype)


def _flash_bwd(qs: Array, k: Array, v: Array, out: Array, lse: Array,
               g: Array, scale: float, bn: int, bm: int):
    """Fused FA2 backward. qs is the PRE-SCALED q; returns grads wrt the
    original (q, k, v)."""
    bh, n, d = qs.shape
    m = k.shape[1]
    d_pad = max(128, _ceil_to(d, 128))
    n_pad = _ceil_to(n, bn)
    m_pad = _ceil_to(m, bm)

    qp = _pad_to(_pad_to(qs, n_pad, 1), d_pad, 2)
    kp = _pad_to(_pad_to(k, m_pad, 1), d_pad, 2)
    vp = _pad_to(_pad_to(v, m_pad, 1), d_pad, 2)
    gp = _pad_to(_pad_to(g, n_pad, 1), d_pad, 2)

    # delta = rowsum(dO ⊙ O) in fp32, broadcast to the two layouts the
    # kernels need (column [bh, n, 128] and row [bh, 8, n])
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    delta = _pad_to(delta, n_pad, 1)  # [bh, n_pad]
    delta_col = jnp.broadcast_to(delta[:, :, None], (bh, n_pad, 128))
    delta_row = jnp.broadcast_to(delta[:, None, :], (bh, 8, n_pad))
    lse_row = jnp.broadcast_to(lse[:, :, 0][:, None, :], (bh, 8, n_pad))

    interp = _interpret()
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, bn=bn, seq_n=n),
        grid=(bh, m_pad // bm, n_pad // bn),
        in_specs=[
            pl.BlockSpec((1, bn, d_pad), lambda b, j, i: (b, i, 0)),   # q
            pl.BlockSpec((1, bn, d_pad), lambda b, j, i: (b, i, 0)),   # do
            pl.BlockSpec((1, 8, bn), lambda b, j, i: (b, 0, i)),        # lse
            pl.BlockSpec((1, 8, bn), lambda b, j, i: (b, 0, i)),        # delta
            pl.BlockSpec((1, bm, d_pad), lambda b, j, i: (b, j, 0)),   # k
            pl.BlockSpec((1, bm, d_pad), lambda b, j, i: (b, j, 0)),   # v
        ],
        out_specs=(
            pl.BlockSpec((1, bm, d_pad), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, bm, d_pad), lambda b, j, i: (b, j, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, m_pad, d_pad), k.dtype),
            jax.ShapeDtypeStruct((bh, m_pad, d_pad), v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((bm, d_pad), jnp.float32),
            pltpu.VMEM((bm, d_pad), jnp.float32),
        ],
        interpret=interp,
    )(qp, gp, lse_row, delta_row, kp, vp)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, bm=bm, seq_m=m, scale=scale),
        grid=(bh, n_pad // bn, m_pad // bm),
        in_specs=[
            pl.BlockSpec((1, bn, d_pad), lambda b, i, j: (b, i, 0)),   # q
            pl.BlockSpec((1, bn, d_pad), lambda b, i, j: (b, i, 0)),   # do
            pl.BlockSpec((1, bn, 128), lambda b, i, j: (b, i, 0)),      # lse
            pl.BlockSpec((1, bn, 128), lambda b, i, j: (b, i, 0)),      # delta
            pl.BlockSpec((1, bm, d_pad), lambda b, i, j: (b, j, 0)),   # k
            pl.BlockSpec((1, bm, d_pad), lambda b, i, j: (b, j, 0)),   # v
        ],
        out_specs=pl.BlockSpec((1, bn, d_pad), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, n_pad, d_pad), qs.dtype),
        scratch_shapes=[pltpu.VMEM((bn, d_pad), jnp.float32)],
        interpret=interp,
    )(qp, gp, lse, delta_col, kp, vp)

    return dq[:, :n, :d], dk[:, :m, :d], dv[:, :m, :d]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash3(q: Array, k: Array, v: Array, scale: float,
            bn: int = 512, bm: int = 512) -> Array:
    # primal (runs only when NOT differentiated — AD uses _flash3_fwd):
    # skip the logsumexp output entirely
    out, _ = _flash_fwd(q * scale, k, v, bn, bm, need_lse=False)
    return out


def _flash3_fwd(q, k, v, scale, bn, bm):
    # Under differentiation, clamp blocks to 512: the backward kernels hold
    # ~[bn, bm] fp32 temps (s/p/ds) per program, which at 1024 blocks sit
    # near the 16MB VMEM ceiling. The 1024 escalation stays on the primal
    # (inference) path, where only the [bn, d] accumulator scales with bn.
    # lse padding follows the fwd bn, so fwd and bwd must clamp identically.
    bn, bm = min(bn, 512), min(bm, 512)
    qs = q * scale
    out, lse = _flash_fwd(qs, k, v, bn, bm)
    return out, (qs, k, v, out, lse)


def _flash3_bwd(scale, bn, bm, res, g):
    bn, bm = min(bn, 512), min(bm, 512)
    qs, k, v, out, lse = res
    dq, dk, dv = _flash_bwd(qs, k, v, out, lse, g, scale, bn, bm)
    return dq, dk, dv


_flash3.defvjp(_flash3_fwd, _flash3_bwd)


def flash_attention(q: Array, k: Array, v: Array, scale: float) -> Array:
    """Multi-head non-causal flash attention.

    q: [B, N, H, Dh], k/v: [B, M, H, Dh] -> [B, N, H, Dh].

    Block sizes scale with sequence length: long sequences (the CTA
    cost-reg runs ~12k-28k tokens) amortize per-step grid overhead over
    1024-token tiles (at dh=16 the kernel is overhead/VPU-bound, not
    MXU-bound, so fewer+bigger steps win), while short ones (ViT at ~1-2k
    tokens) keep 512 tiles to bound padding waste.
    """
    b, n, h, dh = q.shape
    m = k.shape[1]
    bn = 1024 if n >= 8192 else 512
    bm = 1024 if m >= 8192 else 512
    qf = jnp.moveaxis(q, 2, 1).reshape(b * h, n, dh)
    kf = jnp.moveaxis(k, 2, 1).reshape(b * h, m, dh)
    vf = jnp.moveaxis(v, 2, 1).reshape(b * h, m, dh)
    out = _flash3(qf, kf, vf, scale, bn, bm)
    return jnp.moveaxis(out.reshape(b, h, n, dh), 1, 2)
