"""Checkpoint save/resume via orbax — sharded, async-capable.

Semantic content matches the reference's checkpoints (base_trainer.py:
149-178): model params + batch stats, optimizer state, step/epoch, the
monitored best value, and the config snapshot; written as `last`, `best`,
and per-epoch steps. Orbax writes sharded arrays natively, superseding the
reference's rank-0 torch.save + `module.` prefix stripping
(train.py:155-161). The best epoch is ALSO saved under `best/` outside the
rotation window (≡ the reference's model_best.pth): max_to_keep only
rotates the per-epoch steps, never the best weights.
"""
from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory, max_to_keep: int = 3, mode: str = "min"):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory / "steps",
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )
        # the best epoch lives OUTSIDE the rotation window (reference
        # model_best.pth, base_trainer.py:149-178)
        self.best_manager = ocp.CheckpointManager(
            self.directory / "best",
            options=ocp.CheckpointManagerOptions(max_to_keep=1, create=True),
        )
        assert mode in ("min", "max"), mode
        self.mode = mode
        self.monitor_best = float("inf") if mode == "min" else float("-inf")

    def _improved(self, value: float) -> bool:
        if self.mode == "min":
            return value < self.monitor_best
        return value > self.monitor_best

    def save(self, epoch: int, state, config: Optional[dict] = None,
             monitor_value: Optional[float] = None,
             interrupted: bool = False) -> bool:
        """Save epoch checkpoint; track/flag best (per `mode`). Returns
        whether this epoch is the new best.

        interrupted=True marks a preemption save taken MID-epoch: resume
        re-runs that epoch instead of advancing past it."""
        # A step may already exist at this epoch: an interrupt save followed
        # by the re-run's end-of-epoch save (which orbax's should_save would
        # silently skip), or a SECOND preemption in the re-run (where
        # force=True would raise StepAlreadyExistsError). Replace it.
        if epoch in self.manager.all_steps():
            self.manager.delete(epoch)
        self.manager.save(epoch, args=ocp.args.StandardSave(state),
                          force=interrupted)
        self.manager.wait_until_finished()
        is_best = False
        if monitor_value is not None and self._improved(float(monitor_value)):
            self.monitor_best = float(monitor_value)
            if epoch in self.best_manager.all_steps():
                self.best_manager.delete(epoch)
            self.best_manager.save(epoch, args=ocp.args.StandardSave(state),
                                   force=True)
            self.best_manager.wait_until_finished()
            (self.directory / "best.json").write_text(json.dumps(
                {"epoch": epoch, "monitor_best": self.monitor_best}))
            is_best = True
        if config is not None:
            (self.directory / "config.json").write_text(json.dumps(config, indent=2))
        meta = {"last_epoch": epoch, "monitor_best": self.monitor_best,
                "mode": self.mode, "interrupted": interrupted}
        (self.directory / "meta.json").write_text(json.dumps(meta))
        return is_best

    def was_interrupted(self) -> bool:
        p = self.directory / "meta.json"
        if p.exists():
            return bool(json.loads(p.read_text()).get("interrupted", False))
        return False

    def latest_epoch(self) -> Optional[int]:
        return self.manager.latest_step()

    def best_epoch(self) -> Optional[int]:
        p = self.directory / "best.json"
        if p.exists():
            return json.loads(p.read_text())["epoch"]
        return None

    def restore(self, state_template, epoch: Optional[int] = None):
        """Restore into the given abstract/concrete state template. An epoch
        that max_to_keep already rotated out of `steps/` is transparently
        served from `best/` when it is the recorded best epoch."""
        if epoch is None:
            epoch = self.latest_epoch()
        if epoch is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        meta_path = self.directory / "meta.json"
        if meta_path.exists():
            meta = json.loads(meta_path.read_text())
            self.monitor_best = meta.get(
                "monitor_best",
                float("inf") if self.mode == "min" else float("-inf"))
        mgr = self.manager
        if epoch not in mgr.all_steps():
            if epoch in self.best_manager.all_steps():
                mgr = self.best_manager
            else:
                raise FileNotFoundError(
                    f"epoch {epoch} not in {self.directory} (steps "
                    f"{self.manager.all_steps()}, best "
                    f"{self.best_manager.all_steps()})")
        restored = mgr.restore(
            epoch, args=ocp.args.StandardRestore(state_template))
        return restored, epoch
