"""Folded volume handoff: StageNet building the cost volume directly in the
regularizer's folded [B, H, W, D*G] layout (reg_layout='dfold') must equal
the plain path (reg_layout='ndhwc' + [B, D, H, W, G] volume) on the SAME
parameters. The handoff replaces two transposes per U-Net stage (the
16x-lane-padded [.., G]-minor intermediate) with one.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvsformerplusplus_tpu.models.stagenet import StageNet


def _stage_inputs(rng, b=1, v=3, h=24, w=32, c=8, d=8):
    feats = rng.rand(b, v, h, w, c).astype(np.float32)
    cam = np.zeros((b, v, 2, 4, 4), dtype=np.float32)
    for vi in range(v):
        ang = 0.1 * vi
        cs, sn = np.cos(ang), np.sin(ang)
        ext = np.eye(4, dtype=np.float32)
        ext[:3, :3] = np.array([[cs, 0, sn], [0, 1, 0], [-sn, 0, cs]],
                               dtype=np.float32)
        ext[0, 3] = 0.3 * vi
        cam[:, vi, 0] = ext
        cam[:, vi, 1, :3, :3] = np.array(
            [[30.0, 0, w / 2], [0, 30.0, h / 2], [0, 0, 1]], dtype=np.float32)
    dvals = np.linspace(2.5, 8.0, d, dtype=np.float32)[None].repeat(b, 0)
    return (jnp.asarray(feats), jnp.asarray(cam), jnp.asarray(dvals))


def _mk(d, reg_layout, warp_mode, **kw):
    return StageNet(ndepth=d, groups=8, cost_reg_type="Normal",
                    depth_type="ce", reg_layout=reg_layout,
                    warp_mode=warp_mode, banded_ky=16, fold_depth=False,
                    **kw)


@pytest.mark.parametrize("d", [8, 16])  # CostRegNet3D (d<=8) and CostRegNet
@pytest.mark.parametrize("warp_mode", ["banded", "xgrouped"])
def test_folded_handoff_matches_plain(d, warp_mode):
    # same warp mode on both sides: this isolates the LAYOUT handoff (warp
    # parity itself is covered by tests/test_grid_sample.py)
    rng = np.random.RandomState(d)
    feats, cam, dvals = _stage_inputs(rng, d=d)
    plain = _mk(d, "ndhwc", warp_mode)
    fold = _mk(d, "dfold", warp_mode)

    variables = jax.jit(
        lambda r: plain.init(r, feats, cam, dvals))(jax.random.PRNGKey(0))
    ref = jax.jit(lambda v: plain.apply(v, feats, cam, dvals))(variables)
    got = jax.jit(lambda v: fold.apply(v, feats, cam, dvals))(variables)
    np.testing.assert_allclose(np.asarray(got["depth"]),
                               np.asarray(ref["depth"]), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got["prob_volume"]),
                               np.asarray(ref["prob_volume"]),
                               rtol=2e-4, atol=2e-4)


def test_build_volume_wrapper_unfolds():
    """External-caller contract: build_volume returns [B, D, H, W, G]
    regardless of reg_layout (the wrapper inverts the folded handoff)."""
    rng = np.random.RandomState(7)
    feats, cam, dvals = _stage_inputs(rng, d=8)
    plain = _mk(8, "ndhwc", "banded")
    fold = _mk(8, "dfold", "banded")
    variables = jax.jit(
        lambda r: plain.init(r, feats, cam, dvals))(jax.random.PRNGKey(1))
    ref = jax.jit(lambda v: plain.apply(
        v, feats, cam, dvals, train=False,
        method=lambda m, *a, **k: m.build_volume(*a, **k)))(variables)
    got = jax.jit(lambda v: fold.apply(
        v, feats, cam, dvals, train=False,
        method=lambda m, *a, **k: m.build_volume(*a, **k)))(variables)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_folded_handoff_gradients(d=8):
    """Training path: gradients through the folded handoff match plain."""
    rng = np.random.RandomState(3)
    feats, cam, dvals = _stage_inputs(rng, d=d)
    plain = _mk(d, "ndhwc", "banded")
    fold = _mk(d, "dfold", "banded")
    variables = plain.init(jax.random.PRNGKey(2), feats, cam, dvals)

    def loss(mod, params):
        out, _ = mod.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            feats, cam, dvals, train=True, mutable=["batch_stats"])
        return jnp.sum(out["prob_volume_pre"] ** 2)

    gp = jax.jit(jax.grad(lambda p: loss(plain, p)))(variables["params"])
    gf = jax.jit(jax.grad(lambda p: loss(fold, p)))(variables["params"])
    for (ka, a), (kb, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(gp),
                   key=lambda kv: jax.tree_util.keystr(kv[0])),
            sorted(jax.tree_util.tree_leaves_with_path(gf),
                   key=lambda kv: jax.tree_util.keystr(kv[0]))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-4, err_msg=str(ka))


@pytest.mark.parametrize("use_pe_proj", [True, False])
def test_cta_folded_matches_plain(use_pe_proj):
    """PureTransformerCostReg folded branch (reshape+einsum patchify /
    pixel-shuffle unpatchify on [B,H,W,D*C]) == the plain NDHWC path on the
    SAME parameters."""
    from mvsformerplusplus_tpu.models.cost_reg import PureTransformerCostReg

    rng = np.random.RandomState(11)
    b, d, h, w, c = 1, 8, 16, 16, 8
    x = jnp.asarray(rng.randn(b, d, h, w, c).astype(np.float32))
    pos = jnp.asarray(rng.rand(b, 3, d, h, w).astype(np.float32))
    # use_pe_proj=False adds the raw 3*(c//3) encoding: c//3 must be even
    # (sin/cos interleave), so c % 6 == 0
    cc = c if use_pe_proj else 12
    if not use_pe_proj:
        x = jnp.asarray(rng.randn(b, d, h, w, cc).astype(np.float32))
    mod = PureTransformerCostReg(base_channel=cc, mid_channel=16,
                                 num_heads=2, layer_num=2,
                                 down_rate=(2, 4, 4),
                                 use_pe_proj=use_pe_proj,
                                 train_avg_length=128)
    variables = jax.jit(lambda r: mod.init(r, x, pos, False))(
        jax.random.PRNGKey(3))
    ref = jax.jit(lambda v: mod.apply(v, x, pos, False))(variables)
    xf = jnp.transpose(x, (0, 2, 3, 1, 4)).reshape(b, h, w, d * cc)
    got = jax.jit(lambda v: mod.apply(v, xf, pos, False, d))(variables)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_cta_stage_folded_full_call():
    """StageNet with a transformer reg + reg_layout dfold == ndhwc."""
    rng = np.random.RandomState(21)
    feats, cam, dvals = _stage_inputs(rng, d=8, h=24, w=32)
    tc = dict(mid_channel=16, num_heads=2, layer_num=2, down_rate=(2, 4, 4),
              train_avg_length=128)
    mk = lambda lay: StageNet(ndepth=8, groups=8,
                              cost_reg_type="PureTransformerCostReg",
                              depth_type="ce", transformer_config=tc,
                              reg_layout=lay, warp_mode="banded",
                              banded_ky=16, fold_depth=False)
    pos = jnp.asarray(rng.rand(1, 3, 8, 24, 32).astype(np.float32))
    plain = mk("ndhwc")
    fold = mk("dfold")
    variables = jax.jit(
        lambda r: plain.init(r, feats, cam, dvals, 1.0, pos))(
            jax.random.PRNGKey(5))
    ref = jax.jit(lambda v: plain.apply(v, feats, cam, dvals, 1.0, pos))(
        variables)
    got = jax.jit(lambda v: fold.apply(v, feats, cam, dvals, 1.0, pos))(
        variables)
    np.testing.assert_allclose(np.asarray(got["depth"]),
                               np.asarray(ref["depth"]), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got["prob_volume"]),
                               np.asarray(ref["prob_volume"]),
                               rtol=2e-4, atol=2e-4)


def test_banded_c32_blocked_matches_folded():
    """The r4 stage-2 production path — C=32 through the BLOCKED banded
    warp (banded_blocked_max_c=32, gy=2/ky=8 auto plan, fused-DMA kernel)
    — must equal the exact folded single-gather baseline. Geometry is
    escape-free by construction (asserted via the shipped diagnostic)."""
    import numpy as np

    from mvsformerplusplus_tpu.ops.geometry import (compose_projection,
                                                    plane_sweep_coords)
    from mvsformerplusplus_tpu.ops.grid_sample import banded_escape_fraction

    rng = np.random.RandomState(7)
    feats, cam, dvals = _stage_inputs(rng, v=3, h=16, w=384, c=32, d=4)
    cam = np.array(cam)
    cam[:, :, 1, :3, :3] *= np.array([[8.0], [1.0], [1.0]], np.float32)
    cam = jnp.asarray(cam)  # stretch fx so u-spans resemble a real sweep
    proj = compose_projection(cam)
    for vi in range(1, 3):
        coords, _ = plane_sweep_coords(proj[:, vi], proj[:, 0],
                                       jnp.asarray(dvals)[:, :, None, None]
                                       * jnp.ones((1, 1, 16, 384)), 16, 384)
        esc = banded_escape_fraction(np.asarray(coords), 16, 384,
                                     gy=2, ky=8, block_w=128)
        assert esc < 1e-9, ("test geometry must be escape-free", vi, esc)

    banded = _mk(4, "dfold", "banded")
    folded = _mk(4, "dfold", "folded")
    variables = jax.jit(
        lambda r: banded.init(r, feats, cam, dvals))(jax.random.PRNGKey(0))
    ref = jax.jit(lambda v: folded.apply(
        v, feats, cam, dvals, method=lambda m, *a: m.build_volume(*a, False)
    ))(variables)
    got = jax.jit(lambda v: banded.apply(
        v, feats, cam, dvals, method=lambda m, *a: m.build_volume(*a, False)
    ))(variables)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
