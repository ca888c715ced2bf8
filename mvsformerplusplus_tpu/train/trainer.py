"""Trainer: epoch loop, shape-bucketed compilation cache, validation with
global metric reduction, checkpointing, early stop.

Re-design of reference trainer/mvsformer_trainer.py + base/base_trainer.py:

- per-crop-scale micro-batching (scale_batch_map) becomes per-bucket jit
  cache entries: each (crop_h, crop_w) bucket compiles once and is reused —
  the schedule guarantees every host steps the same bucket;
- bf16 compute needs no GradScaler (reference fp16 scaler machinery,
  trainer:146-181, is dropped — bf16 has fp32 range);
- validation metrics are jnp means under the sharded step — globally exact
  without explicit all_reduce (reference :240-252);
- monitor 'min mean_error' drives best-checkpoint + early stop
  (base_trainer.py:92-118).
"""
from __future__ import annotations

import json
import logging
import time
from pathlib import Path
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _array_batch(batch):
    """Strip non-array leaves (filenames, scan ids) before jit."""
    return {k: v for k, v in batch.items()
            if not isinstance(v, (str, list))}

from .checkpoints import CheckpointManager
from .metrics import depth_metrics
from .optim import make_optimizer
from .step import TrainState, make_eval_step, make_train_step

log = logging.getLogger("mvsformerplusplus_tpu")


class Trainer:
    def __init__(self, model, train_loader, val_loader=None, *,
                 save_dir="saved", epochs: int = 15, tx=None,
                 loss_kwargs: Optional[dict] = None,
                 monitor: str = "min mean_error", early_stop: int = 10,
                 logging_every: int = 100, config: Optional[dict] = None,
                 mesh=None):
        self.model = model
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.epochs = epochs
        self.tx = tx if tx is not None else make_optimizer(
            total_steps=epochs * max(1, train_loader.steps_per_epoch()))
        self.loss_kwargs = loss_kwargs or {}
        self.monitor_mode, self.monitor_key = monitor.split()
        self.early_stop = early_stop
        self.logging_every = logging_every
        self.config = config
        self.mesh = mesh
        self.ckpt = CheckpointManager(Path(save_dir) / "checkpoints")
        self._step_fn = None
        self._eval_fn = None

    # -- compiled steps (cached per bucket automatically by jax.jit) --------
    def _train_step(self):
        if self._step_fn is None:
            step = make_train_step(self.model, self.tx, **self.loss_kwargs)
            self._step_fn = jax.jit(step, donate_argnums=(0,))
        return self._step_fn

    def _eval_step(self):
        if self._eval_fn is None:
            self._eval_fn = jax.jit(make_eval_step(self.model))
        return self._eval_fn

    def init_state(self, sample_batch) -> TrainState:
        variables = jax.jit(
            lambda r: self.model.init(
                r, sample_batch["imgs"], sample_batch["cams"],
                sample_batch["depth_values"], train=True)
        )(jax.random.PRNGKey(0))
        return TrainState.create(variables, self.tx)

    def resume(self, state: TrainState) -> tuple:
        try:
            state, epoch = self.ckpt.restore(state)
            log.info("resumed from epoch %d", epoch)
            return state, epoch + 1
        except FileNotFoundError:
            return state, 0

    def train(self, state: Optional[TrainState] = None) -> TrainState:
        start_epoch = 0
        not_improved = 0
        step_fn = self._train_step()

        for epoch in range(start_epoch, self.epochs):
            t0 = time.time()
            losses = []
            for i, (batch, crop_hw) in enumerate(self.train_loader.epoch(epoch)):
                if state is None:
                    state = self.init_state(batch)
                state, logs = step_fn(state, _array_batch(batch))
                if i % self.logging_every == 0:
                    loss = float(logs["loss"])
                    losses.append(loss)
                    log.info("epoch %d step %d crop %s loss %.4f gnorm %.3f",
                             epoch, i, crop_hw, loss, float(logs["grad_norm"]))
            train_time = time.time() - t0

            val_metrics = {}
            if self.val_loader is not None:
                val_metrics = self.validate(state)
                log.info("epoch %d val %s", epoch,
                         {k: round(float(v), 4) for k, v in val_metrics.items()})

            monitor_value = float(val_metrics.get(self.monitor_key, np.nan))
            is_best = self.ckpt.save(
                epoch, state, config=self.config,
                monitor_value=None if np.isnan(monitor_value) else monitor_value)
            log.info("epoch %d done in %.1fs best=%s", epoch, train_time, is_best)

            if not np.isnan(monitor_value):
                not_improved = 0 if is_best else not_improved + 1
                if not_improved >= self.early_stop:
                    log.info("early stop at epoch %d", epoch)
                    break
        return state

    def validate(self, state: TrainState) -> Dict[str, float]:
        eval_fn = self._eval_step()
        sums: Dict[str, float] = {}
        n = 0
        for batch, _ in self.val_loader.epoch(0):
            m = eval_fn(state, _array_batch(batch))
            for k, v in m.items():
                if k in ("depth", "confidence"):
                    continue
                sums[k] = sums.get(k, 0.0) + float(v)
            n += 1
        return {k: v / max(1, n) for k, v in sums.items()}
