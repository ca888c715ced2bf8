"""Per-bucket remat granularity (Trainer remat_map).

The memory lever orthogonal to the reference's scale_batch_map
(config/mvsformer++.json:159-169): once micro-batch is 1 the reference
has nothing left, but swapping the jax.checkpoint granularity per
crop-height class trades replayed volume-build FLOPs for activation
memory (docs/bucket_table.md: 1024x1280 B=1 misses one v5e's HBM by
242M under cost_reg remat).  Remat must be a MATH IDENTITY: the mapped
bucket's step produces the same loss/params as the default step.
"""
import jax
import numpy as np
import pytest

from tests.test_casmvs import make_inputs


def _batch(rng, b, h, w):
    imgs, cams, dv = make_inputs(rng, b=b, v=3, h=h, w=w)
    batch = {
        "imgs": np.asarray(imgs), "cams": jax.tree.map(np.asarray, cams),
        "depth_values": np.asarray(dv),
        "depth_gt": {
            f"stage{i+1}": rng.uniform(
                3, 7, (b, h // (8 >> i), w // (8 >> i))).astype(np.float32)
            for i in range(4)},
    }
    batch["mask"] = {k: np.ones_like(g) for k, g in batch["depth_gt"].items()}
    return batch


class _Loader:
    def __init__(self, items):
        self.items = items

    def steps_per_epoch(self):
        return len(self.items)

    def epoch(self, epoch):
        return iter(self.items)


def test_remat_map_per_bucket_step_identity(tmp_path):
    from mvsformerplusplus_tpu.models.casmvs import CasMVSNet
    from mvsformerplusplus_tpu.train.optim import make_optimizer
    from mvsformerplusplus_tpu.train.trainer import Trainer

    rng = np.random.RandomState(0)
    h, w = 64, 128
    batch = _batch(rng, 2, h, w)

    model = CasMVSNet(ndepths=(8, 4, 4, 4), remat_stages=True,
                      remat_granularity="stage")
    trainer = Trainer(
        model, _Loader([(batch, (h, w))]), epochs=1,
        tx=make_optimizer(total_steps=10, warmup_steps=1),
        save_dir=tmp_path, remat_map={str(h): "cost_reg"}, logging_every=1)

    # the mapped bucket gets a model clone at the override granularity;
    # unmapped buckets keep the model's own
    assert trainer._model_for(h).remat_granularity == "cost_reg"
    assert trainer._model_for(128) is model
    # distinct compiled-step cache entries per granularity
    s_mapped = trainer._step_for(1, h)
    s_plain = trainer._step_for(1, 128)
    assert s_mapped is not s_plain
    assert set(trainer._accum_steps) == {(1, "cost_reg"), (1, "")}

    # remat granularity is a math identity: same batch, same init ->
    # same loss through either step
    state = trainer.init_state(batch)
    _, logs_m = s_mapped(state, batch)
    state2 = trainer.init_state(batch)
    _, logs_p = s_plain(state2, batch)
    np.testing.assert_allclose(float(logs_m["loss"]), float(logs_p["loss"]),
                               rtol=1e-5)


def test_remat_map_config_wires_through(tmp_path):
    """train.py passes trainer.remat_map from config into the Trainer."""
    import json
    import re
    from pathlib import Path

    src = Path("train.py").read_text()
    assert re.search(r"remat_map=cfg\[.trainer.\]\.get\(.remat_map", src)
