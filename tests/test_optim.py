"""Optimizer/schedule units: warmup-cosine shape, ViT group freezing,
layer-decay scales."""
import numpy as np

import jax
import jax.numpy as jnp
import optax

from mvsformerplusplus_tpu.train.optim import (
    make_optimizer,
    scale_vit_grads_by_layer,
    vit_layer_decay_scales,
    warmup_cosine_schedule,
)


def test_warmup_cosine_matches_reference_lambda():
    """Reference utils.py:448-460: linear warmup then cosine to min_lr frac."""
    import math

    base, warm, total, floor = 1e-3, 10, 100, 0.01
    sched = warmup_cosine_schedule(base, warm, total, floor)
    for step in [0, 5, 9, 10, 50, 99, 100]:
        if step < warm:
            ref = base * step / warm
        else:
            ref = base * (floor + (1 - floor) * 0.5 *
                          (1 + math.cos(math.pi * (step - warm) / (total - warm))))
        np.testing.assert_allclose(float(sched(step)), ref, rtol=1e-6)


def test_frozen_vit_gets_zero_updates():
    params = {
        "vit": {"blocks_0": {"kernel": jnp.ones((4, 4))}},
        "fmt": {"kernel": jnp.ones((4, 4))},
    }
    tx = make_optimizer(freeze_vit=True, total_steps=100, warmup_steps=0)
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    assert float(jnp.abs(updates["vit"]["blocks_0"]["kernel"]).max()) == 0.0
    assert float(jnp.abs(updates["fmt"]["kernel"]).max()) > 0.0


def test_unfrozen_vit_updates():
    params = {"vit": {"blocks_0": {"kernel": jnp.ones((4, 4))}},
              "head": {"kernel": jnp.ones((4, 4))}}
    tx = make_optimizer(freeze_vit=False, total_steps=100, warmup_steps=0)
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    assert float(jnp.abs(updates["vit"]["blocks_0"]["kernel"]).max()) > 0.0


def test_layer_decay_scales():
    scales = vit_layer_decay_scales(0.75, depth=12)
    # embedding layers get the deepest decay, final norm the least
    assert scales["patch_embed"] == 0.75 ** 13
    assert scales["blocks_11"] == 0.75 ** 1
    assert scales["norm"] == 0.75 ** 0

    params = {"vit": {"blocks_0": {"k": jnp.ones(3)}, "norm": {"k": jnp.ones(3)}}}
    tx = scale_vit_grads_by_layer(optax.sgd(1.0), 0.75, 12)
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    np.testing.assert_allclose(
        np.asarray(updates["vit"]["blocks_0"]["k"]), -(0.75 ** 12), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(updates["vit"]["norm"]["k"]), -1.0, rtol=1e-6)
