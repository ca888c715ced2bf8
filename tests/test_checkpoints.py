"""CheckpointManager: best survives rotation; monitor max mode; metric
threshold scaling (review findings r2)."""
import jax.numpy as jnp
import numpy as np

from mvsformerplusplus_tpu.train.checkpoints import CheckpointManager


def _state(v: float):
    return {"w": np.full((4,), v, np.float32)}


def test_best_survives_rotation(tmp_path):
    """max_to_keep rotates per-epoch steps, but the BEST epoch must stay
    restorable (reference keeps model_best.pth outside rotation,
    base_trainer.py:149-178): best at epoch 1, then train past the keep
    window and restore the best."""
    mgr = CheckpointManager(tmp_path, max_to_keep=2)
    vals = {0: 5.0, 1: 1.0, 2: 4.0, 3: 4.5, 4: 6.0}  # best = epoch 1
    for e, v in vals.items():
        mgr.save(e, _state(float(e)), monitor_value=v)
    assert mgr.best_epoch() == 1
    assert 1 not in mgr.manager.all_steps()  # rotated out of steps/
    restored, epoch = mgr.restore(_state(0.0), epoch=mgr.best_epoch())
    assert epoch == 1
    np.testing.assert_array_equal(restored["w"], np.full((4,), 1.0))
    # latest still restores from steps/
    restored, epoch = mgr.restore(_state(0.0))
    assert epoch == 4


def test_monitor_max_mode(tmp_path):
    """mode='max' (reference base_trainer.py:49 mnt_mode) must track the
    HIGHEST monitor value."""
    mgr = CheckpointManager(tmp_path, mode="max")
    assert mgr.save(0, _state(0.0), monitor_value=0.1)
    assert not mgr.save(1, _state(1.0), monitor_value=0.05)  # worse
    assert mgr.save(2, _state(2.0), monitor_value=0.9)       # better
    assert mgr.best_epoch() == 2
    # mode restored from meta on a fresh manager
    mgr2 = CheckpointManager(tmp_path, mode="max")
    restored, epoch = mgr2.restore(_state(0.0), epoch=mgr2.best_epoch())
    assert epoch == 2 and mgr2.monitor_best == 0.9


def test_metric_thresholds_scale_with_interval():
    """thresNmm must scale by the per-sample depth interval (reference
    mvsformer_trainer.py:293-314): a scene at 100x metric scale with 100x
    errors must score identically to the unit-scale scene."""
    from mvsformerplusplus_tpu.train.metrics import depth_metrics

    rng = np.random.RandomState(0)
    gt = rng.uniform(400, 900, (1, 16, 16)).astype(np.float32)
    err = rng.uniform(-5, 5, (1, 16, 16)).astype(np.float32)
    mask = np.ones_like(gt)

    m1 = depth_metrics(jnp.asarray(gt + err), jnp.asarray(gt),
                       jnp.asarray(mask), scale=jnp.asarray([1.0]))
    m100 = depth_metrics(jnp.asarray(100 * (gt + err)), jnp.asarray(100 * gt),
                         jnp.asarray(mask), scale=jnp.asarray([100.0]))
    for k in ("thres2mm_error", "thres8mm_error", "mean_error"):
        np.testing.assert_allclose(float(m1[k]), float(m100[k]), atol=1e-6)
