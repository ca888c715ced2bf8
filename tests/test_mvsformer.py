"""Flagship DINOv2MVSNet smoke on tiny dimensions: exercises DINOv2 taps,
CrossVITDecoder (SVA), FMT + pathway, CTA cost reg with 3D PE, remat."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvsformerplusplus_tpu.models.mvsformer import DINOv2MVSNet
from tests.test_casmvs import make_inputs

TINY_TRANSFORMER_CFG = (
    dict(
        mid_channel=16,
        num_heads=2,
        down_rate=(2, 4, 4),
        mlp_ratio=2,
        layer_num=2,
        position_encoding=True,
        softmax_scale="entropy_invariance",
        train_avg_length=12185,
        use_pe_proj=True,
    ),
)

TINY_FMT_CFG = dict(
    attention_type="Linear",
    d_model=32,
    nhead=2,
    layer_names=("self", "cross", "self", "cross"),
    softmax_scale="entropy_invariance",
    train_avg_length=12185,
    post_norm=False,
    pre_norm_query=False,
)

TINY_DECODER_CFG = dict(
    d_model=48,
    nhead=2,
    attention_type="Linear",
    softmax_scale="entropy_invariance",
    train_avg_length=762,
    prev_values=0.5,
    init_values=1.0,
    pre_norm_query=True,
)


@pytest.fixture(scope="module")
def flagship():
    rng = np.random.RandomState(0)
    imgs, cams, dv = make_inputs(rng, h=64, w=128)
    model = DINOv2MVSNet(
        feat_chs=(4, 8, 16, 32),
        vit_ch=48,
        vit_depth=3,
        vit_num_heads=2,
        out_ch=32,
        ndepths=(8, 4, 4, 4),
        groups=(4, 4, 4, 4),
        decoder_cfg=TINY_DECODER_CFG,
        fmt_config=TINY_FMT_CFG,
        transformer_config=TINY_TRANSFORMER_CFG,
        cost_reg_type=("PureTransformerCostReg", "Normal", "Normal", "Normal"),
        use_pe3d=True,
        remat_stages=True,
    )
    # shrink the ViT via dataclass replace-like construction is not possible on
    # nn.Module attrs; instead monkey-build: DINOv2MVSNet hardcodes ViT-B dims
    # except embed_dim==vit_ch, so pass vit_ch=48 and patch stays 14.
    variables = jax.jit(lambda r: model.init(r, imgs, cams, dv, train=False))(
        jax.random.PRNGKey(0)
    )
    return model, variables, (imgs, cams, dv)


def test_flagship_forward(flagship):
    model, variables, (imgs, cams, dv) = flagship
    out = jax.jit(lambda v: model.apply(v, imgs, cams, dv, train=False))(variables)
    b, v, h, w, _ = imgs.shape
    assert out["refined_depth"].shape == (b, h, w)
    d = np.asarray(out["refined_depth"])
    # untrained weights + inverse-depth band scheduling can legally cross
    # zero inverse depth (the reference's optional `shift` guard is off by
    # default) — require finiteness, not positivity
    assert np.isfinite(d).all()
    conf = np.asarray(out["photometric_confidence"])
    assert (conf >= 0).all() and (conf <= 1 + 1e-5).all()


def test_flagship_train_grads(flagship):
    from mvsformerplusplus_tpu.losses import multi_stage_loss

    model, variables, (imgs, cams, dv) = flagship
    b, v, h, w, _ = imgs.shape
    rng = np.random.RandomState(1)
    gt = {
        f"stage{i + 1}": jnp.asarray(
            rng.uniform(3, 7, (b, h // (8 >> i) if i < 3 else h, w // (8 >> i) if i < 3 else w)).astype(np.float32)
        )
        for i in range(4)
    }
    masks = {k: jnp.ones_like(v_) for k, v_ in gt.items()}
    depth_interval = dv[:, 1] - dv[:, 0]

    def loss_fn(params):
        out, _ = model.apply(
            {**variables, "params": params}, imgs, cams, dv, train=True,
            mutable=["batch_stats"],
        )
        total, _ = multi_stage_loss(out, gt, masks, depth_interval)
        return total

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(variables["params"])
    assert np.isfinite(float(loss))
    flat = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # frozen ViT: stop_gradient must zero its grads
    vit_grads = jax.tree.leaves(grads["vit"])
    assert all(float(jnp.abs(g).max()) == 0.0 for g in vit_grads)
    # trainable parts must receive nonzero grads
    fmt_norm = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads["fmt"]))
    assert fmt_norm > 0
