"""DINOv2 backbone parity: our flax ViT + weight converter vs the reference
torch implementation (used as a pure test oracle; nothing is imported into
the framework itself)."""
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from mvsformerplusplus_tpu.models.dino import DinoVisionTransformer

sys.path.insert(0, "/root/reference")


@pytest.fixture(scope="module")
def torch_vit():
    from models.dino.dinov2 import vit_base

    torch.manual_seed(0)
    model = vit_base(img_size=518, patch_size=14, init_values=1.0, block_chunks=0,
                     ffn_layer="mlp", cross_interval_layers=3)
    model.eval()
    # randomize weights deterministically (pretrained not available offline)
    sd = model.state_dict()
    g = torch.Generator().manual_seed(42)
    for k, v in sd.items():
        if v.dtype.is_floating_point:
            sd[k] = torch.randn(v.shape, generator=g) * 0.02
    model.load_state_dict(sd)
    return model


def test_interval_features_parity(torch_vit):
    from tools.convert_dinov2 import convert_state_dict, merge_vit_params, unflatten

    h = w = 14 * 6  # 6x6 patch grid (forces pos-embed interpolation from 37x37)
    rng = np.random.RandomState(0)
    img = rng.rand(2, h, w, 3).astype(np.float32)

    with torch.no_grad():
        ref_feats = torch_vit.forward_interval_features(
            torch.from_numpy(np.moveaxis(img, -1, 1)))
    ref_feats = [f.numpy() for f in ref_feats]

    model = DinoVisionTransformer(dtype=jnp.float32)
    variables = jax.jit(lambda r: model.init(r, jnp.asarray(img)))(jax.random.PRNGKey(0))
    flat = convert_state_dict(torch_vit.state_dict())
    variables = merge_vit_params({"params": {"vit": variables["params"]}},
                                 unflatten(flat))
    params = variables["params"]["vit"]
    got = jax.jit(lambda p, x: model.apply({"params": p}, x))(params, jnp.asarray(img))
    got = [np.asarray(f) for f in got]

    assert len(got) == len(ref_feats) == 3
    for i, (g, r) in enumerate(zip(got, ref_feats)):
        assert g.shape == r.shape, (g.shape, r.shape)
        # bicubic pos-embed interp differs by <1e-4; transformer amplifies a bit
        np.testing.assert_allclose(g, r, rtol=2e-2, atol=2e-3,
                                   err_msg=f"level {i}")
