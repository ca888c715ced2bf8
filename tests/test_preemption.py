"""Preemption-safe checkpointing: SIGTERM-class interrupts save mid-epoch
and resume re-runs the interrupted epoch (SURVEY §5: the reference has no
elastic-recovery story — restart is manual --resume losing up to an epoch).
"""
import numpy as np
import pytest

import jax

from tests.test_parallel import make_inputs


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


@pytest.mark.slow
def test_interrupt_checkpoint_and_resume(tmp_path):
    from mvsformerplusplus_tpu.models.casmvs import CasMVSNet
    from mvsformerplusplus_tpu.train.optim import make_optimizer
    from mvsformerplusplus_tpu.train.trainer import Trainer

    rng = np.random.RandomState(0)
    h, w = 64, 128
    batch = _batch(rng, 2, h, w)

    def make_trainer():
        model = CasMVSNet(ndepths=(8, 4, 4, 4), remat_stages=False)

        class Loader:
            def steps_per_epoch(self):
                return 3

            def epoch(self, epoch):
                yield batch, (h, w)
                yield batch, (h, w)
                trainer._preempted = True  # the SIGTERM handler's effect
                yield batch, (h, w)

        trainer = Trainer(
            model, Loader(), epochs=2,
            tx=make_optimizer(total_steps=10, warmup_steps=1),
            save_dir=tmp_path, logging_every=10,
        )
        return trainer

    trainer = make_trainer()
    state = trainer.init_state(batch)
    state = trainer.train(state)
    # drained the in-flight step, then stopped: 3 of the 6 scheduled steps
    assert int(state.step) == 3
    assert trainer.ckpt.was_interrupted()

    # resume re-runs epoch 0 (mid-epoch save must not skip the epoch)
    trainer2 = make_trainer()
    template = trainer2.init_state(batch)
    restored, start_epoch = trainer2.resume(template)
    assert start_epoch == 0
    assert int(restored.step) == 3

    # a second preemption in the re-run epoch must overwrite, not crash
    trainer2.ckpt.save(0, restored, interrupted=True)
    assert trainer2.ckpt.was_interrupted()

    # a normal end-of-epoch save clears the interrupted flag AND actually
    # replaces the mid-epoch step data (orbax should_save would silently
    # skip an existing step): save a state advanced past the interrupt
    # point and assert the restore returns it.
    advanced = restored.replace(step=restored.step + 99)
    trainer2.ckpt.save(0, advanced, monitor_value=1.0)
    assert not trainer2.ckpt.was_interrupted()
    restored2, start_epoch = trainer2.resume(template)
    assert start_epoch == 1
    assert int(restored2.step) == int(restored.step) + 99
