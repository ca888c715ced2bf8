"""Distribution correctness: view-sharded cost volume == unsharded; data
sharding leaves results identical to single-device."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mvsformerplusplus_tpu.models.casmvs import CasMVSNet
from mvsformerplusplus_tpu.parallel.mesh import make_mesh
from tests.test_casmvs import make_inputs


@pytest.mark.slow
def test_view_sharded_volume_matches_unsharded():
    rng = np.random.RandomState(0)
    imgs, cams, dv = make_inputs(rng, v=5)  # 4 source views -> 2 per cv shard

    base = CasMVSNet(ndepths=(8, 4, 4, 4), remat_stages=False, shard_views=False)
    variables = jax.jit(lambda r: base.init(r, imgs, cams, dv, train=False))(
        jax.random.PRNGKey(0))
    ref = jax.jit(lambda v: base.apply(v, imgs, cams, dv, train=False))(variables)

    sharded = CasMVSNet(ndepths=(8, 4, 4, 4), remat_stages=False, shard_views=True)
    mesh = make_mesh(n_data=1, n_cv=2, devices=jax.devices()[:2])
    with jax.sharding.set_mesh(mesh):
        out = jax.jit(lambda v: sharded.apply(v, imgs, cams, dv, train=False))(
            variables)
    np.testing.assert_allclose(
        np.asarray(ref["refined_depth"]), np.asarray(out["refined_depth"]),
        rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(ref["stage1"]["prob_volume"]),
        np.asarray(out["stage1"]["prob_volume"]), rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_data_sharded_forward_matches():
    rng = np.random.RandomState(1)
    imgs, cams, dv = make_inputs(rng, b=4, v=3)
    model = CasMVSNet(ndepths=(8, 4, 4, 4), remat_stages=False)
    variables = jax.jit(lambda r: model.init(r, imgs, cams, dv, train=False))(
        jax.random.PRNGKey(0))
    ref = jax.jit(lambda v: model.apply(v, imgs, cams, dv, train=False))(variables)

    mesh = make_mesh(n_data=4, n_cv=1, devices=jax.devices()[:4])
    bspec = NamedSharding(mesh, P("data"))
    rspec = NamedSharding(mesh, P())
    imgs_s = jax.device_put(imgs, bspec)
    cams_s = jax.tree.map(lambda x: jax.device_put(x, bspec), cams)
    dv_s = jax.device_put(dv, bspec)
    vars_s = jax.device_put(variables, rspec)
    with jax.sharding.set_mesh(mesh):
        out = jax.jit(lambda v, i, c, d: model.apply(v, i, c, d, train=False))(
            vars_s, imgs_s, cams_s, dv_s)
    np.testing.assert_allclose(
        np.asarray(ref["refined_depth"]), np.asarray(out["refined_depth"]),
        rtol=1e-4, atol=1e-4)
