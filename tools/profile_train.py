"""Op-level attribution of the flagship TRAINING step on TPU.

    python tools/profile_train.py             # trace + parse
    python tools/profile_train.py --no-remat  # ablate stage-level remat

Traces one compiled train step at the DTU MS protocol (B=2 512x640, 5 views,
192 depths, bf16 — bench.py's train workload) and rolls the xprof
framework_op_stats into the same category table as tools/profile_eval.py.
The backward (warp VJPs, 3D-conv transposes, remat replays) is where the
train-MFU headroom hides (reference has only wall-clock timing,
trainer/mvsformer_trainer.py:183-188).
"""
from __future__ import annotations

import argparse
import os
import sys
import time

if os.environ.get("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION") != "python":
    os.environ["PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION"] = "python"
    os.execv(sys.executable, [sys.executable] + sys.argv)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_trace(outdir: str, remat: bool, granularity: str = "stage"):
    import jax
    import jax.numpy as jnp

    from bench import make_train_batch
    from mvsformerplusplus_tpu.models.mvsformer import DINOv2MVSNet
    from mvsformerplusplus_tpu.train.optim import make_optimizer
    from mvsformerplusplus_tpu.train.step import TrainState, make_train_step
    from mvsformerplusplus_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    batch = make_train_batch()
    model = DINOv2MVSNet(dtype=jnp.bfloat16, remat_stages=remat,
                         remat_granularity=granularity)
    tx = make_optimizer(total_steps=10000, warmup_steps=500, freeze_vit=True)
    jb = jax.tree.map(jnp.asarray, batch)
    variables = jax.jit(
        lambda r: model.init(r, jb["imgs"], jb["cams"], jb["depth_values"],
                             train=False))(jax.random.PRNGKey(0))
    state = TrainState.create(variables, tx)
    step = jax.jit(make_train_step(model, tx))

    t0 = time.time()
    state, logs = step(state, jb)
    jax.block_until_ready(logs["loss"])
    print(f"compile+first step: {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    state, logs = step(state, jb)
    jax.block_until_ready(logs["loss"])
    print(f"steady-state: {(time.time() - t0) * 1000:.0f} ms/step "
          f"(remat={remat}, granularity={granularity})", flush=True)

    jax.profiler.start_trace(outdir)
    state, logs = step(state, jb)
    jax.block_until_ready(logs["loss"])
    jax.profiler.stop_trace()
    print(f"trace written to {outdir}", flush=True)


def main():
    from profile_eval import parse_trace

    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default="/tmp/xprof_train")
    ap.add_argument("--parse-only", action="store_true")
    ap.add_argument("--no-remat", action="store_true")
    ap.add_argument("--granularity", default="stage",
                    choices=["stage", "cost_reg"])
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()
    if not args.parse_only:
        run_trace(args.outdir, remat=not args.no_remat,
                  granularity=args.granularity)
    return parse_trace(args.outdir, args.top)


if __name__ == "__main__":
    sys.exit(main())
