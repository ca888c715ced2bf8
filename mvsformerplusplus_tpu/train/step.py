"""Train/eval steps: functional state + sharded jit.

Distribution model (replaces the reference's DDP layer, train.py:196-200,
trainer/mvsformer_trainer.py:240-252): the step is jit'd with the batch
sharded over the `data` mesh axis and state replicated. XLA then:
- computes global-batch BatchNorm statistics (≡ SyncBatchNorm),
- all-reduces gradients across data shards (≡ DDP),
- reduces metrics globally (≡ dist.all_reduce of val metrics),
with no explicit collective code. The `cv` axis partitions cost-volume
source views inside the model (models/stagenet.py).

Gradient accumulation over micro-batches (the reference's scale_batch_map
loop, trainer/mvsformer_trainer.py:100-149) is a lax.scan over a leading
micro-batch axis.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import flax
import jax
import jax.numpy as jnp
import optax

from ..losses import multi_stage_loss
from .metrics import depth_metrics

Array = jax.Array


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: Array

    @classmethod
    def create(cls, variables, tx):
        params = variables["params"]
        return cls(
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(params),
            step=jnp.zeros((), jnp.int32),
        )

    def variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}


def _debug_logs(grads) -> Dict[str, Array]:
    """Per-top-level-module gradient norms + non-finite counts (≡ the
    reference's --debug per-layer scaled-grad inspection,
    trainer/mvsformer_trainer.py:151-168 — there it hunts fp16 overflow;
    here it localizes inf/NaN sources under bf16)."""
    out: Dict[str, Array] = {}
    for mod, sub in grads.items():
        out[f"gnorm/{mod}"] = optax.global_norm(sub)
        out[f"nonfinite/{mod}"] = sum(
            jnp.sum(~jnp.isfinite(g)) for g in jax.tree.leaves(sub))
    return out


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    depth_types: Sequence[str] = ("ce", "ce", "ce", "ce"),
    dlossw: Sequence[float] = (1.0, 1.0, 1.0, 1.0),
    inverse_depth: bool = True,
    clip_func: Optional[str] = "dynamic",
    debug: bool = False,
) -> Callable:
    """Returns step(state, batch) -> (state, logs).

    batch: {imgs [B,V,H,W,3], cams {stageN: [B,V,2,4,4]},
            depth_values [B,D], depth_gt {stageN: [B,h,w]},
            mask {stageN: [B,h,w]}}

    logs carries the stage-4 depth/confidence of the batch as device arrays
    (for the trainer's image panels, reference utils.py:103-123) — they cost
    nothing unless the host fetches them.
    """

    def loss_fn(params, batch_stats, batch):
        outputs, updates = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["imgs"], batch["cams"], batch["depth_values"],
            train=True, mutable=["batch_stats"],
        )
        depth_interval = batch["depth_values"][:, 1] - batch["depth_values"][:, 0]
        total, loss_dict = multi_stage_loss(
            outputs, batch["depth_gt"], batch["mask"], depth_interval,
            depth_types=depth_types, dlossw=dlossw,
            inverse_depth=inverse_depth, clip_func=clip_func,
        )
        return total, (updates["batch_stats"], loss_dict, outputs)

    def step(state: TrainState, batch) -> Tuple[TrainState, Dict[str, Array]]:
        (loss, (new_stats, loss_dict, outputs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, batch)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        logs = {"loss": loss, "grad_norm": optax.global_norm(grads), **loss_dict}
        if "refined_depth" in outputs:
            logs["depth_est"] = outputs["refined_depth"]
            logs["conf_est"] = outputs.get("photometric_confidence")
        if debug:
            logs.update(_debug_logs(grads))
        new_state = TrainState(
            params=new_params, batch_stats=new_stats,
            opt_state=new_opt, step=state.step + 1,
        )
        return new_state, logs

    return step


def make_accum_train_step(model, tx, n_micro: int,
                          depth_types: Sequence[str] = ("ce", "ce", "ce", "ce"),
                          dlossw: Sequence[float] = (1.0, 1.0, 1.0, 1.0),
                          inverse_depth: bool = True,
                          clip_func: Optional[str] = "dynamic",
                          debug: bool = False) -> Callable:
    """Gradient-accumulated step: batch leaves carry a leading micro axis
    [n_micro, B_micro, ...]; grads averaged over micro-batches before one
    optimizer update (≡ reference trainer micro-batch loop,
    trainer/mvsformer_trainer.py:100-149)."""

    def loss_fn(params, batch_stats, batch):
        outputs, updates = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["imgs"], batch["cams"], batch["depth_values"],
            train=True, mutable=["batch_stats"],
        )
        depth_interval = batch["depth_values"][:, 1] - batch["depth_values"][:, 0]
        total, loss_dict = multi_stage_loss(
            outputs, batch["depth_gt"], batch["mask"], depth_interval,
            depth_types=depth_types, dlossw=dlossw,
            inverse_depth=inverse_depth, clip_func=clip_func,
        )
        return total, (updates["batch_stats"], loss_dict,
                       outputs["refined_depth"])

    def step(state: TrainState, batch):
        def micro(carry, mb):
            grads_acc, stats, loss_acc, _ = carry
            (loss, (new_stats, _, depth)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params, stats, mb)
            grads_acc = jax.tree.map(lambda a, g: a + g, grads_acc, grads)
            # carry (not stack) the depth: the LAST micro-batch's panel is
            # representative and the carry keeps one copy in memory
            return (grads_acc, new_stats, loss_acc + loss,
                    depth.astype(jnp.float32)), None

        zero_grads = jax.tree.map(jnp.zeros_like, state.params)
        ish = batch["imgs"].shape  # [n_micro, B_micro, V, H, W, 3]
        depth0 = jnp.zeros((ish[1], ish[3], ish[4]), jnp.float32)
        (grads, new_stats, loss_sum, depth), _ = jax.lax.scan(
            micro, (zero_grads, state.batch_stats, 0.0, depth0), batch
        )
        grads = jax.tree.map(lambda g: g / n_micro, grads)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        logs = {"loss": loss_sum / n_micro, "grad_norm": optax.global_norm(grads),
                "depth_est": depth}
        if debug:
            logs.update(_debug_logs(grads))
        return TrainState(new_params, new_stats, new_opt, state.step + 1), logs

    return step


def make_eval_step(model, tmp: Sequence[float] = (5.0, 5.0, 5.0, 1.0),
                   thresholds: Sequence[float] = (2.0, 4.0, 8.0, 14.0, 20.0),
                   interval_norm: str = "dtu") -> Callable:
    """Returns eval(state, batch) -> metrics dict (validation metric set,
    reference trainer/mvsformer_trainer.py:256-354).

    interval_norm scales the nominal mm thresholds per sample by the depth
    interval (reference :293-314): 'blended' uses di*N (scene scale is
    arbitrary there), 'dtu' uses di/2.65*N (== N mm at the standard DTU
    2.5*1.06 interval, and interval-proportional for any other)."""

    def evaluate(state: TrainState, batch):
        outputs = model.apply(
            state.variables(), batch["imgs"], batch["cams"],
            batch["depth_values"], tmp=tuple(tmp), train=False,
        )
        key = f"stage{len(tmp)}"
        dv = batch["depth_values"]
        di = (dv[:, 1] - dv[:, 0]).astype(jnp.float32)  # [B]
        scale = di if interval_norm == "blended" else di / 2.65
        m = depth_metrics(
            outputs["refined_depth"], batch["depth_gt"][key],
            batch["mask"][key] > 0.5, thresholds, scale=scale,
        )
        m["depth"] = outputs["refined_depth"]
        m["confidence"] = outputs["photometric_confidence"]
        return m

    return evaluate
