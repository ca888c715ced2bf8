"""Attention primitives: linear attention vs reference formula, flash kernel
vs dense softmax attention, entropy-invariant scale."""
import math

import numpy as np
import torch

from mvsformerplusplus_tpu.ops.attention import (
    entropy_inv_scale,
    linear_attention,
    softmax_attention_xla,
)
from mvsformerplusplus_tpu.ops.pallas.flash_attention import flash_attention


def torch_linear_attention(q, k, v):
    """Reference CrossLinearAttention core (attention.py:261-291) as oracle."""
    eps = 1e-6
    q = torch.nn.functional.elu(q) + 1
    k = torch.nn.functional.elu(k) + 1
    kv = torch.einsum("nshd,nshm->nhmd", k, v)
    z = 1 / (torch.einsum("nlhd,nhd->nlh", q, k.sum(dim=1)) + eps)
    return torch.einsum("nlhd,nhmd,nlh->nlhm", q, kv, z)


def test_linear_attention_matches_reference():
    rng = np.random.RandomState(0)
    b, n, h, d = 2, 37, 4, 16
    q, k, v = (rng.randn(b, n, h, d).astype(np.float32) for _ in range(3))
    got = np.asarray(linear_attention(q, k, v))
    ref = torch_linear_attention(*(torch.from_numpy(t) for t in (q, k, v))).numpy()
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)


def test_entropy_inv_scale():
    # reference: scale = d^-0.5 * log_N(train_avg_length)
    s = entropy_inv_scale(16, 1000, 12185)
    assert abs(s - 16**-0.5 * math.log(1000, 12185)) < 1e-9
    assert entropy_inv_scale(16, 1000, None) == 16**-0.5


def test_flash_attention_matches_dense():
    rng = np.random.RandomState(1)
    b, n, m, h, d = 1, 300, 200, 2, 16
    q = rng.randn(b, n, h, d).astype(np.float32) * 0.5
    k = rng.randn(b, m, h, d).astype(np.float32) * 0.5
    v = rng.randn(b, m, h, d).astype(np.float32)
    scale = entropy_inv_scale(d, n, 12185)
    got = np.asarray(flash_attention(q, k, v, scale))
    ref = np.asarray(softmax_attention_xla(q, k, v, scale))
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-4)


def test_flash_attention_grad_matches_dense():
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(2)
    b, n, h, d = 1, 130, 2, 8
    q = rng.randn(b, n, h, d).astype(np.float32) * 0.3
    k = rng.randn(b, n, h, d).astype(np.float32) * 0.3
    v = rng.randn(b, n, h, d).astype(np.float32)
    scale = d**-0.5

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, scale) ** 2)

    def loss_dense(q, k, v):
        return jnp.sum(softmax_attention_xla(q, k, v, scale) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=3e-3, atol=3e-4)


def test_flash_attention_grad_multiblock_cross():
    """Fused Pallas backward across MULTIPLE key/query blocks and n != m
    (streamed dk/dv accumulation + final-block padding masks)."""
    import jax
    import jax.numpy as jnp

    from mvsformerplusplus_tpu.ops.pallas.flash_attention import _flash3

    rng = np.random.RandomState(3)
    bh, n, m, d = 2, 300, 200, 16
    q = rng.randn(bh, n, d).astype(np.float32) * 0.3
    k = rng.randn(bh, m, d).astype(np.float32) * 0.3
    v = rng.randn(bh, m, d).astype(np.float32)
    g = rng.randn(bh, n, d).astype(np.float32)
    scale = d**-0.5

    def dense(q, k, v):
        s = jnp.einsum("bnd,bmd->bnm", q * scale, k)
        return jnp.einsum("bnm,bmd->bnd", jax.nn.softmax(s, axis=-1), v)

    # bn=bm=128 -> 3 query blocks, 2 key blocks, both with padding remainders
    _, vjp = jax.vjp(lambda q, k, v: _flash3(q, k, v, scale, 128, 128), q, k, v)
    gf = vjp(g)
    _, vjp_d = jax.vjp(dense, q, k, v)
    gd = vjp_d(g)
    for a, b_ in zip(gf, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=3e-3, atol=3e-4)
