"""Pallas fused 3x3 conv == XLA conv (torch 'same' zero padding), fwd + VJP.

ops/pallas/conv2d.py replaces the narrow-channel full-res convs XLA lowers
badly (the decoder/visibility heads); these tests pin bit-level forward
parity (interpret mode) and gradient parity against lax.conv.
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from mvsformerplusplus_tpu.ops.pallas.conv2d import conv3x3_p  # noqa: E402


def _ref_conv(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("ci,co,h,w", [(8, 8, 16, 128), (64, 8, 24, 256),
                                       (16, 16, 32, 128), (1, 16, 16, 128)])
def test_conv3x3_matches_xla(ci, co, h, w):
    rng = np.random.RandomState(ci + co)
    x = jnp.asarray(rng.randn(2, h, w, ci).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, ci, co).astype(np.float32) * 0.1)
    got = jax.jit(conv3x3_p)(x, k)
    ref = jax.jit(_ref_conv)(x, k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_conv3x3_grads_match_xla():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 16, 128, 8).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 8, 16).astype(np.float32) * 0.1)
    g = jnp.asarray(rng.randn(2, 16, 128, 16).astype(np.float32))

    def loss_p(x, k):
        return jnp.sum(conv3x3_p(x, k) * g)

    def loss_r(x, k):
        return jnp.sum(_ref_conv(x, k) * g)

    gx_p, gk_p = jax.jit(jax.grad(loss_p, argnums=(0, 1)))(x, k)
    gx_r, gk_r = jax.jit(jax.grad(loss_r, argnums=(0, 1)))(x, k)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk_p), np.asarray(gk_r),
                               rtol=1e-4, atol=1e-4)


def test_conv3x3_bf16_edge_rows():
    """bf16 + an H that forces multi-block grids with edge clamping."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 64, 128, 8).astype(np.float32), jnp.bfloat16)
    k = jnp.asarray(rng.randn(3, 3, 8, 8).astype(np.float32) * 0.1,
                    jnp.bfloat16)
    got = jax.jit(conv3x3_p)(x, k)
    ref = jax.jit(_ref_conv)(x, k)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_conv3x3_channel_split_is_exact():
    """Channel-splitting (MMConv's wide-input route) == whole conv: conv is
    linear in input-channel groups; fp32 cross-chunk accumulation."""
    rng = np.random.RandomState(9)
    x = jnp.asarray(rng.randn(1, 16, 128, 64).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 64, 8).astype(np.float32) * 0.1)
    whole = jax.jit(conv3x3_p)(x, k)
    parts = sum(
        jax.jit(conv3x3_p)(x[..., s:s + 16], k[:, :, s:s + 16])
        for s in range(0, 64, 16))
    np.testing.assert_allclose(np.asarray(parts), np.asarray(whole),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("k,ci,co,h,w", [(5, 8, 8, 16, 128),
                                         (7, 3, 8, 16, 96),
                                         (5, 16, 8, 24, 256),
                                         (7, 8, 8, 16, 128)])
def test_conv_odd_k_matches_xla(k, ci, co, h, w):
    """Generalized odd-k kernel (5x5 / 7x7 — the FPN encoder's full-res
    stack, reference models/module.py:208-239)."""
    from mvsformerplusplus_tpu.ops.pallas.conv2d import (conv2d_p,
                                                         conv2d_viable)
    assert conv2d_viable(h, w, ci, co, k, k)
    rng = np.random.RandomState(k * ci + co)
    x = jnp.asarray(rng.randn(2, h, w, ci).astype(np.float32))
    kk = jnp.asarray(rng.randn(k, k, ci, co).astype(np.float32) * 0.1)
    p = (k - 1) // 2
    got = jax.jit(conv2d_p)(x, kk)
    ref = jax.jit(lambda x, kk: jax.lax.conv_general_dilated(
        x, kk, (1, 1), [(p, p), (p, p)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")))(x, kk)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_conv_odd_k_grads_match_xla():
    from mvsformerplusplus_tpu.ops.pallas.conv2d import conv2d_p
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(1, 16, 128, 8).astype(np.float32))
    k = jnp.asarray(rng.randn(5, 5, 8, 8).astype(np.float32) * 0.1)
    g = jnp.asarray(rng.randn(1, 16, 128, 8).astype(np.float32))

    def loss(f):
        def inner(x, k):
            return jnp.sum(f(x, k) * g)
        return inner

    ref_conv = lambda x, k: jax.lax.conv_general_dilated(
        x, k, (1, 1), [(2, 2), (2, 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    gx_p, gk_p = jax.jit(jax.grad(loss(conv2d_p), argnums=(0, 1)))(x, k)
    gx_r, gk_r = jax.jit(jax.grad(loss(ref_conv), argnums=(0, 1)))(x, k)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk_p), np.asarray(gk_r),
                               rtol=1e-4, atol=1e-4)


def test_fold_factor_even_width():
    """Mosaic can't shape-cast odd folded widths under bf16 sublane packing
    (measured: wf=5 at the train-crop stage-2 vis conv [128,160,1->16]);
    the fold picker must only return even-W' folds, and the kernel must
    stay value-correct at the shape that used to break."""
    from mvsformerplusplus_tpu.ops.pallas.conv2d import (_fold_factor,
                                                         conv2d_p,
                                                         conv2d_viable)

    f = _fold_factor(160, 1, 16, 3)
    assert f > 0 and (160 // f) % 2 == 0, f
    for w in (80, 120, 160, 320, 384, 640, 1536):
        for ci, co in ((1, 16), (8, 64), (16, 8), (64, 8)):
            ff = _fold_factor(w, ci, co, 3)
            if ff:
                assert (w // ff) % 2 == 0, (w, ci, co, ff)
    assert conv2d_viable(128, 160, 1, 16, 3, 3)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 128, 160, 1).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 1, 16).astype(np.float32) * 0.1)
    got = jax.jit(conv2d_p)(x, k)
    ref = jax.jit(_ref_conv)(x, k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
