"""Optimizer + LR schedule: AdamW with warmup-cosine and ViT/base param
groups.

Re-design of reference utils.py:448-481:
- warmup: linear 0 -> 1 over `warmup_steps`; then cosine from 1 down to the
  *fractional* floor `min_lr` (reference lr_lambda, utils.py:453-458);
- param groups: non-ViT params at `lr` with weight_decay **0.0**, ViT params
  at `vit_lr` with `weight_decay` (reference get_parameter_groups,
  utils.py:463-481);
- frozen ViT -> its params get zero updates (optax mask), mirroring
  requires_grad=False (reference models/dino/dinov2.py:164-165).
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import optax


def warmup_cosine_schedule(base_lr: float, warmup_steps: int, total_steps: int,
                           min_lr_frac: float) -> optax.Schedule:
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(1.0, warmup_steps)
        denom = max(1, total_steps - warmup_steps)
        cos = min_lr_frac + (1.0 - min_lr_frac) * 0.5 * (
            1.0 + jnp.cos(math.pi * (step - warmup_steps) / denom)
        )
        return base_lr * jnp.where(step < warmup_steps, warm, cos)

    return schedule


def _is_vit_path(path) -> bool:
    return len(path) > 0 and getattr(path[0], "key", path[0]) == "vit"


def make_optimizer(
    lr: float = 1e-3,
    vit_lr: float = 3e-5,
    weight_decay: float = 0.01,
    min_lr_frac: float = 0.01,
    warmup_steps: int = 500,
    total_steps: int = 100_000,
    freeze_vit: bool = True,
    grad_clip: Optional[float] = None,
) -> optax.GradientTransformation:
    """Build the two-group AdamW with schedules; labels by top-level 'vit'."""
    main_tx = optax.adamw(
        warmup_cosine_schedule(lr, warmup_steps, total_steps, min_lr_frac),
        b1=0.9, b2=0.999, weight_decay=0.0,
    )
    if freeze_vit:
        vit_tx = optax.set_to_zero()
    else:
        vit_tx = optax.adamw(
            warmup_cosine_schedule(vit_lr, warmup_steps, total_steps, min_lr_frac),
            b1=0.9, b2=0.999, weight_decay=weight_decay,
        )

    def label_fn(params):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: "vit" if _is_vit_path(path) else "main", params
        )

    tx = optax.multi_transform({"main": main_tx, "vit": vit_tx}, label_fn)
    if grad_clip is not None:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    return tx


def vit_layer_decay_scales(layer_decay: float = 0.75, depth: int = 12):
    """BEiT-style layer-wise LR scale per ViT sub-tree (reference
    models/lr_decay.py:13-83; unused by the default configs, available for
    unfrozen-ViT fine-tuning). Returns a label->scale mapping keyed by the
    flax param-tree names of models/dino.py."""
    num_layers = depth + 1
    scales = [layer_decay ** (num_layers - i) for i in range(num_layers + 1)]
    mapping = {"patch_embed": scales[0], "cls_token": scales[0],
               "pos_embed": scales[0], "norm": scales[num_layers]}
    for i in range(depth):
        mapping[f"blocks_{i}"] = scales[i + 1]
    return mapping


def scale_vit_grads_by_layer(tx: optax.GradientTransformation,
                             layer_decay: float = 0.75,
                             depth: int = 12) -> optax.GradientTransformation:
    """Wrap an optimizer with per-ViT-layer gradient scaling (applied before
    the inner update, equivalent to per-group lr_scale)."""
    scales = vit_layer_decay_scales(layer_decay, depth)

    def scale_fn(path, g):
        if _is_vit_path(path) and len(path) > 1:
            key = getattr(path[1], "key", None)
            return g * scales.get(key, 1.0)
        return g

    def init(params):
        return tx.init(params)

    def update(grads, state, params=None):
        grads = jax.tree_util.tree_map_with_path(scale_fn, grads)
        return tx.update(grads, state, params)

    return optax.GradientTransformation(init, update)
