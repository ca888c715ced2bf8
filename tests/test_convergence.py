"""Golden-loss regression vs the reference torch training stack.

The reference trainer's exact step (model.forward -> get_multi_stage_losses
-> backward -> SGD, trainer/mvsformer_trainer.py:100-181) runs on CPU for
N steps on a fixed tiny batch, starting from weights CONVERTED into our
framework; our train step must track its loss and grad-norm trajectory.
Because step k's weights depend on step k-1's gradients, agreement over
multiple steps proves gradient parity through the full stack — the
convergence-relevant property (VERDICT r1 next-step #8).

The reference is imported strictly as a CPU test oracle (flash_attn is
emulated, see test_reference_parity).
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
import optax

from tests.test_reference_parity import (  # noqa: F401 (installs flash fake)
    _full_model_args,
    _make_cams,
    convert_full_state_dict,
    merge_variables,
    randomize_,
)

LR = 1e-3
STEPS = 3


def _make_batch(b=1, v=3, h=128, w=192, d=192):
    rng = np.random.RandomState(11)
    imgs = rng.rand(b, v, 3, h, w).astype(np.float32)
    cams = _make_cams(rng, b, v, h, w)
    depth_min, depth_interval = 4.0, 0.01
    dv = (depth_min + np.arange(d) * depth_interval)[None].astype(
        np.float32).repeat(b, 0)
    depth_gt, mask = {}, {}
    for si in range(4):
        hh, ww = h // (8 >> si), w // (8 >> si)
        depth_gt[f"stage{si + 1}"] = rng.uniform(
            4.2, 5.7, (b, hh, ww)).astype(np.float32)
        mask[f"stage{si + 1}"] = (rng.rand(b, hh, ww) > 0.2).astype(np.float32)
    return imgs, cams, dv, depth_gt, mask


@pytest.mark.slow
def test_loss_trajectory_tracks_reference():
    from models.losses import get_multi_stage_losses
    from models.networks.DINOv2_mvsformer_model import DINOv2MVSNet as TorchModel

    from mvsformerplusplus_tpu.config import Config, build_model
    from mvsformerplusplus_tpu.train.step import TrainState, make_train_step

    args = _full_model_args()
    loss_arg = {"dlossw": [1.0, 1.0, 1.0, 1.0], "special_loss_stage": [],
                "logvar_weight": 0.1, "clip_func": "dynamic",
                "focal": False, "gamma": 2.0}
    tm = TorchModel(args)
    randomize_(tm, 33)
    tm.train()

    imgs, cams, dv, depth_gt, mask = _make_batch()
    imgs_t = torch.from_numpy(imgs)
    cams_t = {k: torch.from_numpy(x) for k, x in cams.items()}
    dv_t = torch.from_numpy(dv)
    gt_t = {k: torch.from_numpy(x) for k, x in depth_gt.items()}
    mask_t = {k: torch.from_numpy(x) for k, x in mask.items()}
    interval_t = torch.from_numpy(
        (dv[:, 1] - dv[:, 0]).astype(np.float32))

    # --- our side: start from the SAME weights (checkpoint conversion) ---
    cfg = Config({"arch": {"args": args}})
    ours = build_model(cfg, dtype=jnp.float32)
    imgs_j = jnp.asarray(imgs.transpose(0, 1, 3, 4, 2))
    batch = {
        "imgs": imgs_j,
        "cams": {k: jnp.asarray(x) for k, x in cams.items()},
        "depth_values": jnp.asarray(dv),
        "depth_gt": {k: jnp.asarray(x) for k, x in depth_gt.items()},
        "mask": {k: jnp.asarray(x) for k, x in mask.items()},
    }
    variables = jax.jit(
        lambda r: ours.init(r, batch["imgs"], batch["cams"],
                            batch["depth_values"], train=False)
    )(jax.random.PRNGKey(0))
    sd0 = {k: t.detach().numpy() for k, t in tm.state_dict().items()}
    params, stats = convert_full_state_dict(sd0, strict=True)
    variables = merge_variables(jax.device_get(variables), params, stats,
                                strict=True)

    tx = optax.sgd(LR)
    state = TrainState.create(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]}, tx)
    step = jax.jit(make_train_step(ours, tx, clip_func=loss_arg["clip_func"]))

    # --- reference torch loop (mirrors mvsformer_trainer.py:128-181, fp32,
    # no accumulation, plain SGD) ---
    opt = torch.optim.SGD([p for p in tm.parameters() if p.requires_grad],
                          lr=LR)
    ref_losses, ref_gnorms = [], []
    for _ in range(STEPS):
        out = tm(imgs_t, cams_t, dv_t)
        loss_dict = get_multi_stage_losses(
            loss_arg, args["depth_type"], out, gt_t, mask_t, interval_t,
            args["inverse_depth"])
        loss = sum(loss_dict.values())
        opt.zero_grad()
        loss.backward()
        g2 = sum(float((p.grad ** 2).sum()) for p in tm.parameters()
                 if p.grad is not None)
        ref_losses.append(float(loss))
        ref_gnorms.append(g2 ** 0.5)
        opt.step()

    our_losses, our_gnorms = [], []
    for _ in range(STEPS):
        state, logs = step(state, batch)
        our_losses.append(float(logs["loss"]))
        our_gnorms.append(float(logs["grad_norm"]))

    # the trajectory (not just step 0) must track: step k's loss depends on
    # step k-1's gradient through the weight update
    np.testing.assert_allclose(our_losses, ref_losses, rtol=1e-2)
    np.testing.assert_allclose(our_gnorms, ref_gnorms, rtol=5e-2)
    # and training must actually make progress on the fixed batch
    assert our_losses[-1] < our_losses[0]
