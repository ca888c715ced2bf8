"""Transformer blocks: attention wrapper, FFNs, CrossBlock, FlashAttnBlock.

Re-designs of the reference's block zoo (models/dino/layers/block.py:272-346,
models/module.py:507-583, models/dino/layers/attention.py) with the backends
mapped to TPU: 'linear' -> einsum linear attention (fp32 island), 'softmax'
-> XLA or Pallas-flash depending on sequence length. Sequence lengths are
static under jit, so the entropy-invariant scale is a trace-time constant.
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import entropy_inv_scale, linear_attention, softmax_attention

Array = jax.Array
Dtype = Any


class MultiHeadAttention(nn.Module):
    """q/k/v projections + backend dispatch.

    variant: 'linear' (CrossLinearAttention, reference attention.py:261-291)
    or 'softmax' (CrossFlashAttention2 / FlashAttention2 semantics,
    attention.py:141-170, 227-258).
    softmax_scale: None -> d^-0.5; 'entropy_invariance' -> ·log_N(avg_len)
    (reference attention.py:83-84).
    """

    dim: int
    num_heads: int
    variant: str = "softmax"
    qkv_bias: bool = False
    proj_bias: bool = True
    softmax_scale: Optional[str] = None
    train_avg_length: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, key: Optional[Array] = None,
                 value: Optional[Array] = None) -> Array:
        b, n, c = x.shape
        key = x if key is None else key
        value = key if value is None else value
        dh = self.dim // self.num_heads

        q = nn.Dense(self.dim, use_bias=self.qkv_bias, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(self.dim, use_bias=self.qkv_bias, dtype=self.dtype, name="k_proj")(key)
        v = nn.Dense(self.dim, use_bias=self.qkv_bias, dtype=self.dtype, name="v_proj")(value)
        q = q.reshape(b, n, self.num_heads, dh)
        k = k.reshape(b, key.shape[1], self.num_heads, dh)
        v = v.reshape(b, value.shape[1], self.num_heads, dh)

        if self.variant == "linear":
            out = linear_attention(q, k, v)
        elif self.variant == "softmax":
            avg = self.train_avg_length if self.softmax_scale == "entropy_invariance" else None
            scale = entropy_inv_scale(dh, n, avg)
            out = softmax_attention(q, k, v, scale)
        else:
            raise ValueError(f"unknown attention variant {self.variant}")

        out = out.reshape(b, n, self.dim).astype(self.dtype)
        return nn.Dense(self.dim, use_bias=self.proj_bias, dtype=self.dtype, name="proj")(out)


class Mlp(nn.Module):
    """Linear-GELU-Linear FFN (reference models/dino/layers/mlp.py)."""

    hidden: int
    out: Optional[int] = None
    bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        out = self.out or x.shape[-1]
        x = nn.Dense(self.hidden, use_bias=self.bias, dtype=self.dtype)(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(out, use_bias=self.bias, dtype=self.dtype)(x)


class SwiGLU(nn.Module):
    """SwiGLU FFN (reference models/dino/layers/swiglu_ffn.py): silu(w1 x) *
    (w2 x) -> w3, hidden sized 2/3·mlp rounded to 8."""

    hidden: int
    out: Optional[int] = None
    bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        out = self.out or x.shape[-1]
        h = (int(self.hidden * 2 / 3) + 7) // 8 * 8
        x12 = nn.Dense(2 * h, use_bias=self.bias, dtype=self.dtype)(x)
        x1, x2 = jnp.split(x12, 2, axis=-1)
        return nn.Dense(out, use_bias=self.bias, dtype=self.dtype)(nn.silu(x1) * x2)


class LayerScale(nn.Module):
    """Learnable per-channel residual scaling (reference
    models/dino/layers/layer_scale.py)."""

    dim: int
    init_value: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        gamma = self.param(
            "gamma", nn.initializers.constant(self.init_value), (self.dim,), jnp.float32
        )
        return (x.astype(jnp.float32) * gamma).astype(self.dtype)


class CrossBlock(nn.Module):
    """Pre/post-norm transformer block with optional cross-attention.

    Reference models/dino/layers/block.py:272-346. `pre_norm_query=False`
    additionally norms key/value with norm1 (used by the SVA decoder).
    """

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    variant: str = "softmax"
    qkv_bias: bool = False
    ffn_type: str = "ffn"  # 'ffn' | 'glu'
    init_values: Optional[float] = 1.0
    softmax_scale: Optional[str] = None
    train_avg_length: Optional[int] = None
    post_norm: bool = False
    pre_norm_query: bool = True
    dtype: Dtype = jnp.float32

    def setup(self):
        # torch nn.LayerNorm default eps (the reference CrossBlock uses the
        # default norm_layer, block.py:286) — not DINOv2's 1e-6
        self.norm1 = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)
        self.norm2 = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)
        self.attn = MultiHeadAttention(
            dim=self.dim,
            num_heads=self.num_heads,
            variant=self.variant,
            qkv_bias=self.qkv_bias,
            softmax_scale=self.softmax_scale,
            train_avg_length=self.train_avg_length,
            dtype=self.dtype,
        )
        ffn_cls = Mlp if self.ffn_type == "ffn" else SwiGLU
        self.mlp = ffn_cls(hidden=int(self.dim * self.mlp_ratio), dtype=self.dtype)
        if self.init_values is not None:
            self.ls1 = LayerScale(self.dim, self.init_values, dtype=self.dtype)
            self.ls2 = LayerScale(self.dim, self.init_values, dtype=self.dtype)
        else:
            self.ls1 = self.ls2 = lambda x: x

    def __call__(self, x: Array, key: Optional[Array] = None,
                 value: Optional[Array] = None) -> Array:
        x = x.astype(self.dtype)
        if self.post_norm:
            x = self.norm1(x + self.ls1(self.attn(x, key=key, value=value))).astype(self.dtype)
            x = self.norm2(x + self.ls2(self.mlp(x))).astype(self.dtype)
        else:
            if not self.pre_norm_query:
                key = self.norm1(key).astype(self.dtype) if key is not None else None
                value = self.norm1(value).astype(self.dtype) if value is not None else None
            x = x + self.ls1(self.attn(self.norm1(x).astype(self.dtype), key=key, value=value))
            x = x + self.ls2(self.mlp(self.norm2(x).astype(self.dtype)))
        return x


class FlashAttnBlock(nn.Module):
    """Cost-volume transformer block operating on [B, L, C] token streams
    (reference models/module.py:534-583). gamma residual scales are scalars
    (torch nn.Parameter(tensor(init_values))), post-norm by default."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    variant: str = "softmax"
    init_values: float = 1.0
    softmax_scale: Optional[str] = None
    train_avg_length: Optional[int] = None
    post_norm: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = x.astype(self.dtype)
        attn = MultiHeadAttention(
            dim=self.dim, num_heads=self.num_heads, variant=self.variant,
            softmax_scale=self.softmax_scale, train_avg_length=self.train_avg_length,
            dtype=self.dtype, name="attn",
        )
        ffn = Mlp(hidden=int(self.dim * self.mlp_ratio), dtype=self.dtype, name="ffn")
        g1 = self.param("gamma1", nn.initializers.constant(self.init_values), (), jnp.float32)
        g2 = self.param("gamma2", nn.initializers.constant(self.init_values), (), jnp.float32)
        norm1 = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")
        norm2 = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")
        if self.post_norm:
            x = norm1(x + g1.astype(self.dtype) * attn(x)).astype(self.dtype)
            x = norm2(x + g2.astype(self.dtype) * ffn(x)).astype(self.dtype)
        else:
            x = x + g1.astype(self.dtype) * attn(norm1(x).astype(self.dtype))
            x = x + g2.astype(self.dtype) * ffn(norm2(x).astype(self.dtype))
        return x
