"""End-to-end smoke: CasMVSNet forward on tiny shapes (shapes, dtypes,
finiteness, confidence range)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvsformerplusplus_tpu.models.casmvs import CasMVSNet


def make_inputs(rng, b=1, v=3, h=64, w=128, dfull=48):
    imgs = rng.rand(b, v, h, w, 3).astype(np.float32)
    cams = {}
    base_intr = np.array([[60.0, 0, 8.0], [0, 60.0, 4.0], [0, 0, 1]], dtype=np.float32)
    for s in range(4):
        scale = 0.125 * (2**s)
        cam = np.zeros((b, v, 2, 4, 4), dtype=np.float32)
        for vi in range(v):
            ang = 0.1 * vi
            c, sn = np.cos(ang), np.sin(ang)
            ext = np.eye(4, dtype=np.float32)
            ext[:3, :3] = np.array([[c, 0, sn], [0, 1, 0], [-sn, 0, c]], dtype=np.float32)
            ext[0, 3] = 0.3 * vi
            cam[:, vi, 0] = ext
            intr = base_intr.copy()
            intr[:2] *= scale / 0.125
            cam[:, vi, 1, :3, :3] = intr
        cams[f"stage{s + 1}"] = cam
    depth_values = np.linspace(2.5, 8.0, dfull, dtype=np.float32)[None].repeat(b, 0)
    return jnp.asarray(imgs), jax.tree.map(jnp.asarray, cams), jnp.asarray(depth_values)


@pytest.fixture(scope="module")
def model_and_vars():
    rng = np.random.RandomState(0)
    imgs, cams, dv = make_inputs(rng)
    model = CasMVSNet(ndepths=(8, 4, 4, 4), remat_stages=False)
    # eager dispatch is ~8ms/op on this CPU build: jit init and both apply
    # modes once for the whole module
    variables = jax.jit(lambda r: model.init(r, imgs, cams, dv, train=False))(
        jax.random.PRNGKey(0)
    )
    apply_eval = jax.jit(lambda v: model.apply(v, imgs, cams, dv, train=False))
    apply_train = jax.jit(
        lambda v: model.apply(v, imgs, cams, dv, train=True, mutable=["batch_stats"])
    )
    return model, variables, (imgs, cams, dv), apply_eval, apply_train


def test_forward_shapes(model_and_vars):
    model, variables, (imgs, cams, dv), apply_eval, _ = model_and_vars
    out = apply_eval(variables)
    b, v, h, w, _ = imgs.shape
    assert out["refined_depth"].shape == (b, h, w)
    assert out["photometric_confidence"].shape == (b, h, w)
    for i, (nd, f) in enumerate(zip((8, 4, 4, 4), (8, 4, 2, 1))):
        s = out[f"stage{i + 1}"]
        assert s["depth"].shape == (b, h // f, w // f)
        assert s["prob_volume"].shape == (b, nd, h // f, w // f)
    d = np.asarray(out["refined_depth"])
    assert np.isfinite(d).all()
    assert (d > 0).all()
    conf = np.asarray(out["photometric_confidence"])
    assert (conf >= 0).all() and (conf <= 1.0 + 1e-5).all()


def test_train_mode_runs_with_batchstats(model_and_vars):
    model, variables, (imgs, cams, dv), _, apply_train = model_and_vars
    out, updates = apply_train(variables)
    assert "batch_stats" in updates
    assert np.isfinite(np.asarray(out["stage1"]["prob_volume_pre"])).all()
    # 'ce' train-mode depth is an argmax gather over the hypotheses
    s1 = out["stage1"]
    depths = np.asarray(s1["depth"])
    hypo = np.asarray(s1["depth_values"])
    assert ((depths >= hypo.min()) & (depths <= hypo.max())).all()


def test_hypotheses_narrow_each_stage(model_and_vars):
    model, variables, (imgs, cams, dv), apply_eval, _ = model_and_vars
    out = apply_eval(variables)
    # the contraction invariant lives in inverse-depth space (inverse_depth
    # scheduling): each stage's inverse-width band must shrink or hold
    widths = []
    for i in range(4):
        hv = np.asarray(out[f"stage{i + 1}"]["depth_values"])
        inv = 1.0 / hv
        widths.append(np.abs(inv.max(axis=1) - inv.min(axis=1)).mean())
    assert widths[1] < widths[0]
    assert widths[2] <= widths[1] * 1.05
    assert widths[3] < widths[2]


def test_log_var_head_end_to_end():
    """Aleatoric-uncertainty wire: log_var=True grows the CostRegNet3D prob
    head to 2 channels, StageNet emits the per-pixel log-variance map, and
    reg_depth_loss's uncertainty term (reference models/losses.py:63-97,
    latent there — no reference caller enables it) gets finite gradients."""
    from mvsformerplusplus_tpu.losses import multi_stage_loss

    rng = np.random.RandomState(3)
    imgs, cams, dv = make_inputs(rng)
    b, v, h, w, _ = imgs.shape
    model = CasMVSNet(ndepths=(8, 4, 4, 4), depth_type=("re",) * 4,
                      log_var=True, remat_stages=False)
    variables = jax.jit(lambda r: model.init(r, imgs, cams, dv, train=False))(
        jax.random.PRNGKey(0))
    out = jax.jit(lambda vv: model.apply(vv, imgs, cams, dv, train=True,
                                         mutable=["batch_stats"]))(variables)[0]
    for i, f in enumerate((8, 4, 2, 1)):
        lv = out[f"stage{i + 1}"]["log_var"]
        assert lv.shape == (b, h // f, w // f)
        assert np.all(np.isfinite(np.asarray(lv)))

    gt = {f"stage{i + 1}": jnp.asarray(
        rng.uniform(3.0, 7.0, (b, h // f, w // f)).astype(np.float32))
        for i, f in enumerate((8, 4, 2, 1))}
    mask = {k: jnp.ones_like(g) for k, g in gt.items()}
    interval = dv[:, 1] - dv[:, 0]

    def loss_fn(params):
        o = model.apply({**variables, "params": params}, imgs, cams, dv,
                        train=True, mutable=["batch_stats"])[0]
        total, ldict = multi_stage_loss(
            o, gt, mask, interval, depth_types=("re",) * 4,
            inverse_depth=False)
        return total, ldict

    (total, ldict), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True))(variables["params"])
    assert np.isfinite(float(total))
    assert any("uncert" in k for k in ldict), sorted(ldict)
    leaves = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)


def test_warp_mode_pallas_matches_folded():
    """Model-level equality of the production TPU warp path (y-grouped
    gather + Pallas blend, depth-FOLDED on the re-centered fine stages)
    against the exact reference-semantics folded gather. At w=256 the
    kernel gates activate for stages 3-4 (W%128, C<=16); stage 1 stays
    folded (full_range).

    fold=False must match everywhere (exactness envelope == the per-depth
    path). fold=True shares one patch across the depth band, whose
    footprint must fit [fold_ky, fold_wx]: true for DTU-protocol geometry
    (measured ZERO additional window escapes vs the unfolded path at the
    bench cams — the ~0.1% escapes are the same epipolar-degenerate pixels
    both paths zero), so the fold case uses DTU-like mild cams while the
    aggressive default cams (79 px of disparity) exercise fold=False."""
    rng = np.random.RandomState(21)
    kw = dict(ndepths=(8, 4, 4, 4), remat_stages=False)

    def run(imgs, cams, dv, fold):
        ref_model = CasMVSNet(warp_mode="folded", **kw)
        variables = jax.jit(
            lambda r: ref_model.init(r, imgs, cams, dv, train=False)
        )(jax.random.PRNGKey(0))
        ref = jax.jit(
            lambda v: ref_model.apply(v, imgs, cams, dv, train=False)
        )(variables)
        pallas_model = CasMVSNet(warp_mode="pallas", fold_depth=fold, **kw)
        got = jax.jit(
            lambda v: pallas_model.apply(v, imgs, cams, dv, train=False)
        )(variables)
        np.testing.assert_allclose(
            np.asarray(got["refined_depth"]),
            np.asarray(ref["refined_depth"]), rtol=1e-4, atol=1e-4)
        for s in ("stage3", "stage4"):
            np.testing.assert_allclose(
                np.asarray(got[s]["prob_volume"]),
                np.asarray(ref[s]["prob_volume"]), rtol=1e-4, atol=1e-4)

    imgs, cams, dv = make_inputs(rng, h=64, w=256)
    run(imgs, cams, dv, fold=False)

    # DTU-like narrow bands: shrink rotations/baselines 5x
    imgs2, cams2, dv2 = make_inputs(rng, h=64, w=256)
    cams2 = dict(cams2)
    for s in range(4):
        cam = np.asarray(cams2[f"stage{s + 1}"]).copy()
        for vi in range(cam.shape[1]):
            ang = 0.02 * vi
            c, sn = np.cos(ang), np.sin(ang)
            cam[:, vi, 0, :3, :3] = np.array(
                [[c, 0, sn], [0, 1, 0], [-sn, 0, c]], np.float32)
            cam[:, vi, 0, 0, 3] = 0.06 * vi
        cams2[f"stage{s + 1}"] = jnp.asarray(cam)
    run(imgs2, cams2, dv2, fold=True)


def test_log_var_gating():
    """Bare log_var=True auto-applies only to stages whose regularizer
    carries the uncertainty head (CostRegNet3D: 'Normal', ndepth<=8); an
    explicit per-stage list naming an unsupported stage raises instead of
    silently dropping the loss term."""
    rng = np.random.RandomState(0)
    imgs, cams, dv = make_inputs(rng)
    m = CasMVSNet(ndepths=(16, 8, 4, 4), log_var=True, remat_stages=False)
    v = jax.jit(lambda r: m.init(r, imgs, cams, dv, train=False))(
        jax.random.PRNGKey(0))
    out = jax.jit(lambda vv: m.apply(vv, imgs, cams, dv, train=False))(v)
    assert "log_var" not in out["stage1"]
    assert "log_var" in out["stage3"] and "log_var" in out["stage4"]

    import pytest as _pytest
    m2 = CasMVSNet(ndepths=(16, 8, 4, 4), log_var=(True, False, False, False),
                   remat_stages=False)
    with _pytest.raises(ValueError, match="CostRegNet3D"):
        jax.eval_shape(lambda r: m2.init(r, imgs, cams, dv, train=False),
                       jax.random.PRNGKey(0))
