"""Attention primitives: entropy-invariant softmax scale, linear attention,
and a dispatcher over XLA / Pallas-flash backends.

The reference's answer to long sequences is kernel choice, not sharding
(SURVEY.md §5): linear attention (O(N)) for the 768-dim SVA decoder and the
FMT layers, flash attention for the ~12k-27k-token cost-volume (CTA) blocks —
plus an entropy-invariance softmax scale `scale * log_N(train_avg_length)`
that makes softmax attention extrapolate across train/test resolutions
(reference models/dino/layers/attention.py:83-84,120,161).

TPU mapping:
- linear attention = two einsums (MXU) with an fp32 island — no kernel
  needed, XLA is already optimal;
- softmax attention dispatches to the Pallas flash kernel
  (ops/pallas/flash_attention.py) above a sequence-length threshold, else a
  fused XLA path.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def entropy_inv_scale(head_dim: int, seq_len: int, train_avg_length: Optional[int]) -> float:
    """softmax scale = d^-0.5 · log_N(train_avg_length) when configured.

    Reference models/dino/layers/attention.py:83-84. `None` -> plain d^-0.5.
    """
    scale = head_dim ** -0.5
    if train_avg_length is not None and seq_len > 1:
        scale *= math.log(seq_len, train_avg_length)
    return scale


def linear_attention(q: Array, k: Array, v: Array) -> Array:
    """elu(+1) linear attention, O(N·d²).

    q, k, v: [B, N, H, Dh]. Returns [B, N, H, Dh] in fp32.
    Reference CrossLinearAttention (models/dino/layers/attention.py:261-291):
    phi(x) = elu(x) + 1; out = phi(q)·(phi(k)ᵀ v) / (phi(q)·Σphi(k)).
    The KV contraction and normalizer run in fp32 (the reference forces fp32
    here even under autocast).
    """
    q = jax.nn.elu(q.astype(jnp.float32)) + 1
    k = jax.nn.elu(k.astype(jnp.float32)) + 1
    v = v.astype(jnp.float32)
    kv = jnp.einsum("bshd,bshm->bhmd", k, v, precision=jax.lax.Precision.HIGHEST)
    z = 1.0 / (
        jnp.einsum("blhd,bhd->blh", q, k.sum(axis=1), precision=jax.lax.Precision.HIGHEST)
        + 1e-6
    )
    return jnp.einsum("blhd,bhmd,blh->blhm", q, kv, z, precision=jax.lax.Precision.HIGHEST)


def softmax_attention_xla(q: Array, k: Array, v: Array, scale: float) -> Array:
    """Materialized-scores attention for short sequences.

    q: [B, N, H, Dh], k/v: [B, M, H, Dh]. fp32 softmax.
    """
    logits = jnp.einsum(
        "bnhd,bmhd->bhnm", q * scale, k, precision=jax.lax.Precision.HIGHEST
    ).astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum(
        "bhnm,bmhd->bnhd", probs.astype(v.dtype), v,
        precision=jax.lax.Precision.HIGHEST,
    )


# Sequences at least this long route to the Pallas flash kernel (avoids
# materializing [N, M] score matrices; 2048² fp32 = 16 MB ≈ VMEM budget).
FLASH_MIN_SEQ = 1024


def softmax_attention(
    q: Array,
    k: Array,
    v: Array,
    scale: float,
    use_flash: Optional[bool] = None,
) -> Array:
    """Dispatching softmax attention. q/k/v: [B, N|M, H, Dh]."""
    n, m = q.shape[1], k.shape[1]
    if use_flash is None:
        use_flash = (
            jax.default_backend() in ("tpu", "axon")
            and n >= FLASH_MIN_SEQ
            and m >= FLASH_MIN_SEQ
        )
    if use_flash:
        from .pallas.flash_attention import flash_attention

        return flash_attention(q, k, v, scale)
    return softmax_attention_xla(q, k, v, scale)
