"""D-folded cost regularizers == plain NDHWC, on the SAME parameters.

The 'dfold' layout (models/layers.py fold_conv3d_kernel) reformulates every
3D conv/deconv of the cost-reg U-Nets as an exactly-equivalent 2D conv with
a block-banded weight, folding the depth axis into channels so the TPU tile
stops padding the 8-64-wide channel dim up to 16x (the r3 profiles' 210-316
ms conv share and the 768x1024 OOM class). Same parameter tree, same
numbers: these tests initialize the PLAIN module and run the folded one on
its params.
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from mvsformerplusplus_tpu.models.cost_reg import (CostRegNet,  # noqa: E402
                                                   CostRegNet3D)
from mvsformerplusplus_tpu.models.layers import (Conv3dBlock,  # noqa: E402
                                                 Deconv3dBlock)


def _compare(plain_mod, fold_mod, x, train=False):
    variables = jax.jit(
        lambda r: plain_mod.init(r, x, train),
        static_argnums=())(jax.random.PRNGKey(0))
    kw = dict(mutable=["batch_stats"]) if train else {}
    ref = jax.jit(lambda v: plain_mod.apply(v, x, train, **kw))(variables)
    got = jax.jit(lambda v: fold_mod.apply(v, x, train, **kw))(variables)
    if train:
        ref, ref_stats = ref
        got, got_stats = got
        for a, b in zip(jax.tree.leaves(ref_stats), jax.tree.leaves(got_stats)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_costregnet3d_dfold_matches_plain():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 4, 16, 24, 8).astype(np.float32))
    _compare(CostRegNet3D(base_channels=8, layout="ndhwc"),
             CostRegNet3D(base_channels=8, layout="dfold"), x)


def test_costregnet3d_dfold_train_stats_match():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 8, 16, 16, 16).astype(np.float32))
    # in_ch != bc exercises the folded inner 1x1 projection
    _compare(CostRegNet3D(base_channels=8, layout="ndhwc"),
             CostRegNet3D(base_channels=8, layout="dfold"), x, train=True)


def test_costregnet_dfold_matches_plain():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 8, 16, 24, 8).astype(np.float32))
    _compare(CostRegNet(base_channels=8, layout="ndhwc"),
             CostRegNet(base_channels=8, layout="dfold"), x)


def test_costregnet_dfold_d16():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 16, 8, 16, 8).astype(np.float32))
    _compare(CostRegNet(base_channels=8, layout="ndhwc"),
             CostRegNet(base_channels=8, layout="dfold"), x)


def test_dfold_gradients_match():
    """Training path: gradients w.r.t. the shared params agree."""
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(1, 4, 16, 16, 8).astype(np.float32))
    plain = CostRegNet3D(base_channels=8, layout="ndhwc")
    fold = CostRegNet3D(base_channels=8, layout="dfold")
    variables = plain.init(jax.random.PRNGKey(0), x, False)

    def loss(mod, params):
        out, _ = mod.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, True, mutable=["batch_stats"])
        return jnp.sum(out ** 2)

    gp = jax.jit(jax.grad(lambda p: loss(plain, p)))(variables["params"])
    gf = jax.jit(jax.grad(lambda p: loss(fold, p)))(variables["params"])
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gf)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-4)


def test_conv3dblock_fold_unit():
    """Block-level: folded Conv3dBlock / Deconv3dBlock == plain on shared
    params, including the D-strided variants CostRegNet uses."""
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 8, 12, 16, 8).astype(np.float32))
    for stride in (1, 2, (1, 2, 2)):
        m = Conv3dBlock(16, stride=stride)
        v = m.init(jax.random.PRNGKey(0), x, False)
        ref = m.apply(v, x, False)
        x2 = jnp.transpose(x, (0, 2, 3, 1, 4)).reshape(2, 12, 16, 8 * 8)
        got2 = m.apply(v, x2, False, d_fold=8)
        d_out = ref.shape[1]
        got = jnp.transpose(
            got2.reshape(2, ref.shape[2], ref.shape[3], d_out, 16),
            (0, 3, 1, 2, 4))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)
    for stride in ((1, 2, 2), (2, 2, 2)):
        m = Deconv3dBlock(4, stride=stride)
        v = m.init(jax.random.PRNGKey(1), x, False)
        ref = m.apply(v, x, False)
        x2 = jnp.transpose(x, (0, 2, 3, 1, 4)).reshape(2, 12, 16, 8 * 8)
        got2 = m.apply(v, x2, False, d_fold=8)
        d_out = ref.shape[1]
        got = jnp.transpose(
            got2.reshape(2, ref.shape[2], ref.shape[3], d_out, 4),
            (0, 3, 1, 2, 4))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)
