#!/usr/bin/env python
"""Training CLI — mirrors the reference's `python train.py --config ...`
surface (reference train.py:210-265) on the TPU stack.

Distribution: instead of `--DDP` + mp.spawn per GPU, pass `--mesh data,cv`
sizes; a single process drives all local devices through sharded jit
(multi-host: run one process per host under jax.distributed).
"""
import argparse
import logging
import os
import sys
from pathlib import Path

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-c", "--config", required=True, help="JSON config path")
    p.add_argument("-r", "--resume", action="store_true")
    p.add_argument("--finetune", action="store_true")
    p.add_argument("--dtu_model_path", default=None)
    p.add_argument("--data_path", default=None)
    p.add_argument("--save_dir", default=None)
    p.add_argument("--mesh", default=None,
                   help="data,cv mesh sizes, e.g. 4,2 (default: all devices data-parallel)")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("-o", "--override", action="append", default=[],
                   help="config override path=value (reference 'a;b;c' syntax)")
    p.add_argument("--debug", action="store_true",
                   help="log per-module grad norms and flag inf/NaN "
                        "gradients with their module (reference --debug)")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host: jax.distributed.initialize() (one process per host)")
    p.add_argument("--coordinator", default=None,
                   help="multi-host rendezvous host:port (also honors "
                        "JAX_COORDINATOR_ADDRESS); on TPU pods / SLURM "
                        "leave unset for auto-detection")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    args = p.parse_args()

    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s %(message)s")

    import jax

    if args.distributed:
        # explicit rendezvous (CLI > env > auto): TPU pods and SLURM
        # auto-detect, but plain multi-host CPU/GPU clusters must name the
        # coordinator (≡ the reference's MASTER_ADDR/env:// rendezvous,
        # reference train.py:244-245)
        coord = args.coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
        nproc = args.num_processes or os.environ.get("JAX_NUM_PROCESSES")
        pid = (args.process_id if args.process_id is not None
               else os.environ.get("JAX_PROCESS_ID"))
        if coord and nproc is not None and pid is not None:
            jax.distributed.initialize(coord, int(nproc), int(pid))
        else:
            jax.distributed.initialize()
    import jax.numpy as jnp

    from mvsformerplusplus_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from mvsformerplusplus_tpu.config import build_model, load_config, parse_override
    from mvsformerplusplus_tpu.data.loader import TrainLoader
    from mvsformerplusplus_tpu.data.mvs_dataset import (
        BlendedTrainDataset, DTUTrainDataset, MultiScaleArgs)
    from mvsformerplusplus_tpu.parallel.mesh import make_mesh
    from mvsformerplusplus_tpu.train.optim import make_optimizer
    from mvsformerplusplus_tpu.train.trainer import Trainer

    overrides = dict(parse_override(o) for o in args.override)
    cfg = load_config(args.config, overrides)
    if args.epochs:
        cfg.set_path("trainer.epochs", args.epochs)
    if args.batch_size:
        cfg.set_path("data_loader.0.args.batch_size", args.batch_size)

    dl_cfg = cfg["data_loader"][0]["args"]
    datapath = args.data_path or dl_cfg["datapath"]
    ms = dl_cfg.get("multi_scale_args", {})
    msa = MultiScaleArgs(
        scales=tuple(map(tuple, ms.get("scales", MultiScaleArgs.scales))),
        resize_range=tuple(ms.get("resize_range", (1.0, 1.2))),
        scale_batch_map=ms.get("scale_batch_map", {}),
    )

    def make_train_ds(entry, path_override=None):
        a = entry["args"]
        cls = DTUTrainDataset if entry["type"] == "DTULoader" else BlendedTrainDataset
        return cls(
            path_override or a["datapath"], a["train_data_list"], mode="train",
            nviews=a.get("nviews", 5), ndepths=a.get("num_depths", 192),
            interval_scale=a.get("interval_scale", 1.06),
            random_crop=a.get("random_crop", True),
            augment=a.get("augment", True),
            aug_args=a.get("aug_args"),
            resize_range=msa.resize_range,
        )

    order_fn = None
    if len(cfg["data_loader"]) > 1:
        # balanced multi-dataset training (reference --balanced_training +
        # BalancedRandomSampler, datasets/balanced_sampling.py:89-155)
        from mvsformerplusplus_tpu.data.loader import BalancedSchedule, ConcatDataset

        children = [make_train_ds(e) for e in cfg["data_loader"]]
        train_ds = ConcatDataset(children)
        order_fn = BalancedSchedule([len(c) for c in children]).epoch
    else:
        train_ds = make_train_ds(cfg["data_loader"][0], args.data_path)

    n_dev = len(jax.devices())
    batch_size = dl_cfg.get("batch_size", 4)  # PER-HOST (loader semantics)
    global_batch = batch_size * jax.process_count()
    if args.mesh:
        n_data, n_cv = map(int, args.mesh.split(","))
    else:
        # default: all devices data-parallel, but the GLOBAL batch must
        # split evenly — clamp to the largest divisor that fits
        n_data = max(d for d in range(1, n_dev + 1)
                     if global_batch % d == 0 and n_dev % d == 0)
        n_cv = 1
        if n_data < n_dev:
            logging.warning(
                "global batch %d not divisible by %d devices: using %d-way "
                "data parallelism (pass --mesh to override)",
                global_batch, n_dev, n_data)
    want = n_data * n_cv
    if want < n_dev and jax.process_count() > 1:
        # a clamped mesh must still span every process EVENLY — a plain
        # devices[:want] prefix can land entirely on host 0, leaving other
        # hosts with no addressable shards of the replicated state
        pc = jax.process_count()
        assert want % pc == 0, (
            f"mesh of {want} devices cannot split over {pc} processes")
        per = want // pc
        devs = []
        for p in range(pc):
            devs += [d for d in jax.devices() if d.process_index == p][:per]
    else:
        devs = jax.devices()[:want]
    mesh = make_mesh(n_data=n_data, n_cv=n_cv, devices=devs)
    loader = TrainLoader(
        train_ds, batch_size=batch_size, scales=msa.scales,
        scale_batch_map=msa.scale_batch_map,
        rank=jax.process_index(), world=jax.process_count(),
        num_workers=dl_cfg.get("num_workers", 4),
        order_fn=order_fn,
    )

    val_loader = None
    val_list = dl_cfg.get("val_data_list")
    if val_list and Path(val_list).exists():
        # val dataset class follows the primary loader entry (reference
        # train.py:74-124 builds val loaders per data_loader type)
        val_cls = (DTUTrainDataset if cfg["data_loader"][0]["type"] == "DTULoader"
                   else BlendedTrainDataset)
        val_ds = val_cls(
            datapath, val_list, mode="val",
            nviews=dl_cfg.get("nviews", 5), ndepths=dl_cfg.get("num_depths", 192),
            interval_scale=dl_cfg.get("interval_scale", 1.06),
        )
        val_loader = TrainLoader(
            val_ds, batch_size=1,
            scales=[(dl_cfg.get("height", 1152), dl_cfg.get("width", 1536))],
            rank=jax.process_index(), world=jax.process_count(),
            num_workers=2,
        )

    opt_cfg = cfg["optimizer"]["args"]
    epochs = cfg["trainer"]["epochs"]
    tx = make_optimizer(
        lr=opt_cfg.get("lr", 1e-3), vit_lr=opt_cfg.get("vit_lr", 3e-5),
        weight_decay=opt_cfg.get("weight_decay", 0.01),
        min_lr_frac=opt_cfg.get("min_lr", 0.01),
        warmup_steps=opt_cfg.get("warmup_steps", 500),
        total_steps=epochs * max(1, loader.steps_per_epoch()),
        freeze_vit=cfg.get_path("arch.args.freeze_vit", True),
        # reference clips grad norms during training
        # (trainer/mvsformer_trainer.py:170-181, trainer.grad_norm)
        grad_clip=cfg["trainer"].get("grad_norm"),
    )
    # BEiT-style layer-wise LR decay for unfrozen-ViT finetunes (reference
    # models/lr_decay.py:13-83 — present-unused there; opt-in here via
    # optimizer.args.layer_decay < 1.0)
    layer_decay = opt_cfg.get("layer_decay")
    if layer_decay and layer_decay < 1.0:
        from mvsformerplusplus_tpu.train.optim import scale_vit_grads_by_layer

        tx = scale_vit_grads_by_layer(
            tx, layer_decay, depth=cfg.get_path("arch.args.vit_depth", 12))

    model = build_model(cfg, dtype=jnp.bfloat16, shard_views=(n_cv > 1))
    loss_cfg = cfg.get_path("arch.loss", {}) or {}
    trainer = Trainer(
        model, loader, val_loader,
        save_dir=args.save_dir or cfg["trainer"].get("save_dir", "saved"),
        epochs=epochs, tx=tx, config=dict(cfg),
        loss_kwargs=dict(
            depth_types=tuple(cfg.get_path("arch.args.depth_type", ("ce",) * 4)),
            dlossw=tuple(loss_cfg.get("dlossw", (1.0,) * 4)),
            inverse_depth=cfg.get_path("arch.args.inverse_depth", True),
            clip_func=loss_cfg.get("clip_func", "dynamic"),
        ),
        scale_batch_map=msa.scale_batch_map,
        # {"1024": "stage", ...}: crop-height classes whose train step
        # compiles with a coarser jax.checkpoint granularity — the memory
        # lever past micro-batch 1 (docs/bucket_table.md)
        remat_map=cfg["trainer"].get("remat_map", {}),
        monitor=cfg["trainer"].get("monitor", "min mean_error"),
        early_stop=cfg["trainer"].get("early_stop", 10),
        logging_every=cfg["trainer"].get("logging_every", 100),
        mesh=mesh,
        use_tensorboard=cfg["trainer"].get("tensorboard", False),
        # BlendedMVS scenes carry arbitrary metric scale: thresNmm validation
        # metrics scale by the per-sample depth interval there (reference
        # mvsformer_trainer.py:288-314)
        interval_norm=("blended"
                       if cfg["data_loader"][0]["type"] == "BlendedLoader"
                       else "dtu"),
        log_images=cfg["trainer"].get("log_images", True),
        # per-module grad norms + inf/NaN localization (≡ reference --debug,
        # trainer/mvsformer_trainer.py:151-168)
        debug=args.debug,
    )

    state = None
    start_epoch = 0
    vit_path = cfg.get_path("arch.args.vit_path")
    load_vit = (not args.resume and not args.finetune
                and vit_path and Path(vit_path).exists())
    if args.resume or args.finetune or load_vit:
        # template state needed for orbax restore / weight merge; build from
        # first batch
        for batch, _ in loader.epoch(0):
            state = trainer.init_state(batch)
            break
    if load_vit:
        # load pretrained DINOv2 weights into the frozen ViT (≡ reference
        # model-construction load, DINOv2_mvsformer_model.py:46-51 via
        # torch_init_model, utils.py:370-397). Accepts the converted flax
        # .npz (tools/convert_dinov2.py) or the original torch .pth.
        from tools.convert_dinov2 import load_vit_tree, merge_vit_params

        vit_tree = load_vit_tree(vit_path)
        variables = merge_vit_params(
            {"params": jax.device_get(state.params)}, vit_tree)
        state = state.replace(params=jax.device_put(
            variables["params"], jax.tree.leaves(state.params)[0].sharding))
        logging.info("loaded pretrained ViT weights from %s", vit_path)
    elif vit_path and not args.resume and not args.finetune:
        logging.warning("!!!No weight in %s — the frozen ViT is RANDOM; "
                        "only smoke runs should proceed", vit_path)
    if args.finetune:
        # finetune (reference train.py:147-176): load model weights from the
        # DTU run. reset_sche=true (config) starts a FRESH optimizer/schedule;
        # reset_sche=false continues the optimizer (moments) and fast-forwards
        # the schedule — the reference replays epoch*len(loader) scheduler
        # steps on the new scheduler (train.py:163-167); here the schedule is
        # a pure function of the opt_state step count, so restoring opt_state
        # (including step) evaluates the new config's schedule at the old
        # step — the same semantics without the replay loop.
        from mvsformerplusplus_tpu.train.checkpoints import CheckpointManager

        src = args.dtu_model_path or cfg.get_path("arch.dtu_model_path")
        mgr = CheckpointManager(src)
        restored, epoch = mgr.restore(state, epoch=mgr.best_epoch())
        if cfg.get_path("arch.reset_sche", True):
            state = state.replace(params=restored.params,
                                  batch_stats=restored.batch_stats)
            logging.info("finetuning from %s (epoch %s), fresh schedule",
                         src, epoch)
        else:
            state = state.replace(params=restored.params,
                                  batch_stats=restored.batch_stats,
                                  opt_state=restored.opt_state,
                                  step=restored.step)
            logging.info("finetuning from %s (epoch %s), schedule continued "
                         "at step %s", src, epoch, int(restored.step))
    elif args.resume:
        state, start_epoch = trainer.resume(state)

    with jax.sharding.set_mesh(mesh):
        trainer.train(state, start_epoch=start_epoch)


if __name__ == "__main__":
    main()
