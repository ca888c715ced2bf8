"""Trainer: epoch loop, shape-bucketed compilation cache, micro-batch
gradient accumulation, validation with global metric reduction,
checkpointing, early stop.

Re-design of reference trainer/mvsformer_trainer.py + base/base_trainer.py:

- per-crop-scale micro-batching (scale_batch_map,
  trainer/mvsformer_trainer.py:100-149) maps to a lax.scan
  gradient-accumulation step: large crops split the host batch into
  micro-batches, one optimizer update per global batch either way;
- each (crop_h, crop_w, n_micro) bucket compiles once and is reused — the
  shape schedule guarantees every host steps the same bucket;
- bf16 compute needs no GradScaler (the reference's fp16 scaler machinery,
  trainer:146-181, is dropped — bf16 has fp32 range);
- validation metrics are jnp means under the sharded step — globally exact
  without explicit all_reduce (reference :240-252);
- monitor 'min mean_error' drives best-checkpoint + early stop
  (base_trainer.py:92-118).
"""
from __future__ import annotations

import contextlib
import json
import logging
import time
from pathlib import Path
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..parallel.mesh import data_extent_per_process, make_global_batch
from ..utils.logging import ImageWriter, ScalarWriter
from .checkpoints import CheckpointManager
from .metrics import depth_metrics
from .optim import make_optimizer
from .step import TrainState, make_accum_train_step, make_eval_step, make_train_step

log = logging.getLogger("mvsformerplusplus_tpu")


def _array_batch(batch):
    """Strip non-array leaves (filenames, scan ids) before jit."""
    return {k: v for k, v in batch.items()
            if not isinstance(v, (str, list))}


def _split_micro(batch, n_micro: int):
    """[B, ...] leaves -> [n_micro, B // n_micro, ...]."""
    return jax.tree.map(
        lambda x: np.asarray(x).reshape(n_micro, x.shape[0] // n_micro, *x.shape[1:]),
        batch,
    )


class Trainer:
    def __init__(self, model, train_loader, val_loader=None, *,
                 save_dir="saved", epochs: int = 15, tx=None,
                 loss_kwargs: Optional[dict] = None,
                 scale_batch_map: Optional[Dict[str, int]] = None,
                 remat_map: Optional[Dict[str, str]] = None,
                 monitor: str = "min mean_error", early_stop: int = 10,
                 logging_every: int = 100, config: Optional[dict] = None,
                 mesh=None, use_tensorboard: bool = False,
                 interval_norm: str = "dtu", log_images: bool = True,
                 debug: bool = False):
        self.model = model
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.epochs = epochs
        self.tx = tx if tx is not None else make_optimizer(
            total_steps=epochs * max(1, train_loader.steps_per_epoch()))
        self.loss_kwargs = loss_kwargs or {}
        self.scale_batch_map = scale_batch_map or {}
        # crop-height-class -> remat granularity override ("stage" /
        # "cost_reg").  The memory knob ORTHOGONAL to scale_batch_map:
        # once micro-batch hits 1 the reference has nothing left, but a
        # TPU-side jax.checkpoint granularity swap trades replayed
        # volume-build FLOPs for activation memory so the largest crop
        # buckets (1024x1280 misses one v5e's HBM by 242M at B=1 under
        # cost_reg remat) still fit.  Buckets not in the map keep the
        # model's own granularity.
        self.remat_map = remat_map or {}
        self.monitor_mode, self.monitor_key = monitor.split()
        self.early_stop = early_stop
        self.logging_every = logging_every
        self.config = config
        self.mesh = mesh
        self.save_dir = Path(save_dir)
        self.ckpt = CheckpointManager(self.save_dir / "checkpoints",
                                      mode=self.monitor_mode)
        self.writer = ScalarWriter(self.save_dir, use_tensorboard)
        self.debug = debug
        self._window_checked: set = set()
        self._compile_barrier_done: set = set()
        self.images = (ImageWriter(self.save_dir, tb=self.writer.tb)
                       if log_images else None)
        self._accum_steps: Dict[Any, Any] = {}  # (n_micro, remat) -> jitted step
        self._eval_fn = None
        self.interval_norm = interval_norm
        self.global_step = 0

    # -- compiled steps (cached per bucket automatically by jax.jit) --------
    def _jit_step(self, step, micro: bool):
        """jit with explicit placement: state replicated, batch sharded over
        the `data` mesh axis (≡ DDP: gradient all-reduce + SyncBN fall out of
        the sharded jit; reference train.py:196-200)."""
        if self.mesh is None:
            return jax.jit(step, donate_argnums=(0,))
        repl = NamedSharding(self.mesh, P())
        batch_sh = NamedSharding(
            self.mesh, P(None, "data") if micro else P("data"))
        return jax.jit(step, donate_argnums=(0,),
                       in_shardings=(repl, batch_sh))

    def _compile_barrier(self, fn, *args):
        """Multi-host compile barrier: AOT-compile (feeding the persistent
        compilation cache), then sync hosts BEFORE the first execution.
        XLA's gloo communicator rendezvous gives peers only ~30 s to show
        up at context creation; per-host compile skew (one host hits the
        compile cache, the other compiles for minutes) blows that window
        and kills the job. The coordination-service barrier (600 s) absorbs
        the skew instead; the real call then compiles near-instantly from
        the persistent cache on every host."""
        key = tuple(jax.tree.map(lambda x: (x.shape, str(x.dtype)),
                                 jax.tree.leaves(args[-1]))) if args else ()
        if key in self._compile_barrier_done:
            return
        self._compile_barrier_done.add(key)
        if jax.process_count() <= 1:
            return
        from jax.experimental import multihost_utils

        fn.lower(*args).compile()
        multihost_utils.sync_global_devices(
            f"compile_barrier_{len(self._compile_barrier_done)}")

    def _model_for(self, crop_h) -> Any:
        """The step's model: identical math, remat granularity possibly
        overridden for this crop-height class (see remat_map)."""
        gran = self.remat_map.get(str(crop_h)) if crop_h else None
        if not gran or getattr(self.model, "remat_granularity", gran) == gran:
            return self.model
        return self.model.clone(remat_granularity=gran)

    def _step_for(self, n_micro: int, crop_h=None):
        gran = self.remat_map.get(str(crop_h), "") if crop_h else ""
        key = (n_micro, gran)
        if n_micro <= 1:
            key = (1, gran)
        if key not in self._accum_steps:
            model = self._model_for(crop_h)
            if n_micro <= 1:
                step = make_train_step(model, self.tx,
                                       debug=self.debug, **self.loss_kwargs)
            else:
                step = make_accum_train_step(model, self.tx, n_micro,
                                             debug=self.debug,
                                             **self.loss_kwargs)
            self._accum_steps[key] = self._jit_step(step, micro=n_micro > 1)
        return self._accum_steps[key]

    def _micro_count(self, crop_hw, batch_size: int) -> int:
        micro = self.scale_batch_map.get(str(crop_hw[0]))
        if not micro or micro >= batch_size:
            return 1
        # each micro-batch must still split evenly over this process's
        # data-axis shards; a micro-batch can't go below one sample per
        # shard, so a configured micro smaller than ld clamps UP to ld
        # (per-device 1 — still the memory-safe direction; falling back to
        # the full unaccumulated batch would be the unsafe one). Above ld,
        # search downward for a feasible divisor (smaller micro-batches are
        # memory-safe, like the reference's scale_batch_map).
        ld = data_extent_per_process(self.mesh) if self.mesh is not None else 1
        micro = max(micro, ld)
        while micro >= ld and (batch_size % micro != 0 or micro % ld != 0):
            micro -= 1
        if micro < ld or micro >= batch_size:
            return 1
        return batch_size // micro

    def _place(self, batch, micro: bool):
        if self.mesh is None:
            return batch
        return make_global_batch(self.mesh, batch, micro=micro)

    def _eval_step(self):
        if self._eval_fn is None:
            self._eval_fn = jax.jit(make_eval_step(
                self.model, interval_norm=self.interval_norm))
        return self._eval_fn

    def init_state(self, sample_batch) -> TrainState:
        variables = jax.jit(
            lambda r: self.model.init(
                r, sample_batch["imgs"], sample_batch["cams"],
                sample_batch["depth_values"], train=True)
        )(jax.random.PRNGKey(0))
        n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(variables["params"]))
        log.info("initialized model: %.2fM params", n_params / 1e6)
        state = TrainState.create(variables, self.tx)
        if self.mesh is not None:
            state = jax.device_put(state, NamedSharding(self.mesh, P()))
        return state

    def resume(self, state: TrainState) -> tuple:
        try:
            state, epoch = self.ckpt.restore(state)
            # continue the scalar-log step series instead of re-emitting
            # from 0 (duplicate step keys corrupt curves across restarts)
            self.global_step = int(state.step)
            if self.ckpt.was_interrupted():
                # preemption save taken mid-epoch: re-run that epoch
                log.info("resumed from interrupt checkpoint (epoch %d)", epoch)
                return state, epoch
            log.info("resumed from epoch %d", epoch)
            return state, epoch + 1
        except FileNotFoundError:
            return state, 0

    def _install_preemption_handler(self):
        """SIGTERM (the preemption signal of every TPU scheduler class) and
        SIGINT set a flag; the step loop drains the current step, saves an
        interrupt checkpoint, and exits cleanly — the elastic-recovery story
        the reference lacks entirely (SURVEY §5: restart there is manual
        --resume from the last epoch boundary, losing up to an epoch)."""
        import signal

        def _flag(signum, frame):
            log.warning("signal %d: checkpointing at next step boundary",
                        signum)
            self._preempted = True

        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                signal.signal(sig, _flag)
            except ValueError:  # not the main thread (tests)
                return

    def _debug_window_check(self, batch):
        """--debug mode: validate the warp-window plans against this
        batch's ACTUAL camera geometry and FAIL LOUDLY if in-image samples
        escape them — silently-zeroed warp samples/gradients otherwise
        (the window plans are escape-pinned on DTU geometry only;
        tools/validate_warp_windows.py is the standalone pre-flight)."""
        from ..ops.window_check import scan_window_report

        h, w = batch["imgs"].shape[-3:-1]
        if (h, w) in self._window_checked:
            return
        self._window_checked.add((h, w))
        reports = scan_window_report(
            self.model, batch["cams"],
            np.asarray(batch["depth_values"]), h, w, train=True,
            prev_depth_quantiles=(0.25, 0.75), row_group_stride=4,
            max_views=4)
        for r in reports:
            log.info("debug window check %s", r)
        bad = [r for r in reports if not r.ok]
        if bad:
            raise ValueError(
                "warp windows ESCAPE on this dataset's geometry: "
                f"{[str(r) for r in bad]} — training would silently zero "
                "warp samples/gradients. Set model.args.warp_mode='folded' "
                "and/or model.args.banded_bwd=false for the offending "
                "stages, or raise banded_ky after validating with "
                "tools/validate_warp_windows.py.")

    def _report_debug(self, logs, epoch: int, i: int):
        """Per-module grad norms; WARN with the module names on inf/NaN
        (≡ reference --debug, trainer/mvsformer_trainer.py:151-168)."""
        gnorms = {k.split("/", 1)[1]: float(v) for k, v in logs.items()
                  if k.startswith("gnorm/")}
        bad = {k.split("/", 1)[1]: int(v) for k, v in logs.items()
               if k.startswith("nonfinite/") and int(v) > 0}
        log.info("debug epoch %d step %d per-module gnorm %s", epoch, i,
                 {k: round(v, 4) for k, v in gnorms.items()})
        self.writer.write("debug", gnorms, self.global_step)
        if bad:
            log.warning("NON-FINITE gradients at epoch %d step %d: %s "
                        "(module -> count)", epoch, i, bad)

    def _write_panels(self, logs, batch, n_micro: int):
        """Depth/GT/error/confidence panels for sample 0 of the (last
        micro-)batch (≡ reference save_images, utils.py:103-123)."""
        try:
            depth = np.asarray(logs["depth_est"])[0]
            conf = logs.get("conf_est")
            conf = None if conf is None else np.asarray(conf)[0]
            gt = batch.get("depth_gt", {}).get("stage4")
            mask = batch.get("mask", {}).get("stage4")
            idx = (-1, 0) if n_micro > 1 else (0,)  # last micro, sample 0
            gt = None if gt is None else np.asarray(gt)[idx]
            mask = None if mask is None else np.asarray(mask)[idx]
            self.images.write("train", self.global_step, depth, gt, conf,
                              mask)
        except Exception as e:  # panels must never kill a training run
            log.warning("image panel write failed: %s", e)

    def train(self, state: Optional[TrainState] = None,
              start_epoch: int = 0) -> TrainState:
        not_improved = 0
        self._preempted = False
        self._install_preemption_handler()

        for epoch in range(start_epoch, self.epochs):
            t0 = time.time()
            n_steps = 0
            for i, (batch, crop_hw) in enumerate(self.train_loader.epoch(epoch)):
                if state is None:
                    state = self.init_state(batch)
                if self.debug:
                    self._debug_window_check(batch)
                batch = _array_batch(batch)
                bsz = batch["imgs"].shape[0]
                n_micro = self._micro_count(crop_hw, bsz)
                if n_micro > 1:
                    batch = _split_micro(batch, n_micro)
                batch = self._place(batch, micro=n_micro > 1)
                step_fn = self._step_for(n_micro, crop_hw[0])
                self._compile_barrier(step_fn, state, batch)
                state, logs = step_fn(state, batch)
                n_steps += 1
                self.global_step += 1
                if self._preempted:
                    jax.block_until_ready(logs["loss"])
                    self.ckpt.save(epoch, state, config=self.config,
                                   interrupted=True)
                    log.info("interrupt checkpoint saved at epoch %d step %d",
                             epoch, i)
                    return state
                if i % self.logging_every == 0:
                    loss = float(logs["loss"])
                    stage_losses = {k: float(v) for k, v in logs.items()
                                    if k.startswith("stage")}
                    log.info("epoch %d step %d crop %s micro %d loss %.4f "
                             "gnorm %.3f %s",
                             epoch, i, crop_hw, n_micro, loss,
                             float(logs["grad_norm"]),
                             {k: round(v, 3)
                              for k, v in stage_losses.items()})
                    self.writer.write("train", {
                        "loss": loss, "grad_norm": float(logs["grad_norm"]),
                        **stage_losses,
                    }, self.global_step)
                    if self.debug:
                        self._report_debug(logs, epoch, i)
                    if self.images is not None and "depth_est" in logs:
                        self._write_panels(logs, batch, n_micro)
            train_time = time.time() - t0

            val_metrics = {}
            if self.val_loader is not None:
                val_metrics = self.validate(state)
                log.info("epoch %d val %s", epoch,
                         {k: round(float(v), 4) for k, v in val_metrics.items()})
                self.writer.write("val", val_metrics, self.global_step)

            monitor_value = float(val_metrics.get(self.monitor_key, np.nan))
            is_best = self.ckpt.save(
                epoch, state, config=self.config,
                monitor_value=None if np.isnan(monitor_value) else monitor_value)
            log.info("epoch %d done: %d steps in %.1fs (%.2f steps/s) best=%s",
                     epoch, n_steps, train_time,
                     n_steps / max(train_time, 1e-9), is_best)

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
        wrote_panel = False
        mesh = self.mesh
        if mesh is not None and jax.process_count() > 1:
            # HOST-LOCAL evaluation: val sets are rank-strided and uneven,
            # so hosts run different numbers of eval steps — global-mesh
            # collectives would mismatch across hosts (deadlock), and
            # global-array metrics would not be host-readable. The state is
            # replicated, so each host re-places its local copy on its own
            # sub-mesh; the (sum, n) allgather below does the global merge.
            from ..parallel.mesh import host_local_mesh

            mesh = host_local_mesh(self.mesh)
            state = jax.device_put(jax.device_get(state),
                                   NamedSharding(mesh, P()))
        mesh_ctx = (jax.sharding.set_mesh(mesh) if mesh is not None
                    else contextlib.nullcontext())
        with mesh_ctx:
          for batch, _ in self.val_loader.epoch(0):
            batch = _array_batch(batch)
            if mesh is not None:
                bsz = batch["imgs"].shape[0]
                ld = mesh.shape["data"]
                if bsz % ld == 0:
                    batch = make_global_batch(mesh, batch, micro=False)
                else:
                    # batch too small to data-shard (e.g. B=1 val batches):
                    # run replicated on the mesh
                    batch = jax.device_put(
                        batch, NamedSharding(mesh, P()))
            m = eval_fn(state, batch)
            if self.images is not None and not wrote_panel:
                wrote_panel = True
                gt = batch.get("depth_gt", {}).get("stage4")
                mask = batch.get("mask", {}).get("stage4")
                try:
                    self.images.write(
                        "val", self.global_step, np.asarray(m["depth"])[0],
                        None if gt is None else np.asarray(gt)[0],
                        np.asarray(m["confidence"])[0],
                        None if mask is None else np.asarray(mask)[0])
                except Exception as e:
                    log.warning("val panel write failed: %s", e)
            for k, v in m.items():
                if k in ("depth", "confidence"):
                    continue
                sums[k] = sums.get(k, 0.0) + float(v)
            n += 1
        if jax.process_count() > 1:
            # allgather (sum, n) pairs and divide AFTER the global sum: with
            # rank-strided val sets of uneven length, mean-of-host-means (the
            # reference's all_reduce/world_size, trainer/mvsformer_trainer.py
            # :240-244) would weight short hosts' batches more — the monitor
            # would depend on host count.
            from jax.experimental import multihost_utils

            # absorb per-host eval compile/step-count skew in the
            # coordination-service barrier (600 s) before the gloo
            # allgather (whose context rendezvous gives peers only ~30 s)
            multihost_utils.sync_global_devices("val_merge")
            assert n > 0, (
                "multi-host validation requires >= 1 val batch per host "
                "(the metric-key vector must agree across hosts for the "
                "allgather); give the val loader at least process_count "
                "samples")
            keys = sorted(sums)
            vec = np.array([sums[k] for k in keys] + [float(n)], np.float32)
            all_vecs = multihost_utils.process_allgather(vec)
            totals = all_vecs.sum(axis=0)
            n_total = max(1.0, float(totals[-1]))
            return {k: float(totals[i]) / n_total for i, k in enumerate(keys)}
        return {k: v / max(1, n) for k, v in sums.items()}
