"""Pre-compile the training-step executable set for the multi-scale bucket
sweep, and measure persistent-cache behaviour.

    python tools/warm_cache.py --config configs/mvsformerplusplus.json \
        [--buckets 0,12,24] [--batch-size 2] [--repeat]

The DTU MS schedule steps through (crop_h, crop_w) buckets (25 in the
production config); each bucket jit-compiles its own executable (plus an
accumulation variant where scale_batch_map splits the batch). First-epoch
latency is therefore dominated by compiles unless the persistent cache
(mvsformerplusplus_tpu/utils/cache.py, /root/.jax_cache) already holds them.
This tool front-loads that cost — run it once per (model config x batch
size) before a training campaign — and with --repeat it re-lowers every
bucket a second time in a FRESH process-level jit cache to report the
persistent-cache hit latency (the number a restarted trainer sees).

Output: one line per (bucket, variant) with compile seconds, plus totals.
Numbers for the flagship at B=2 are committed in docs/profiles/.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_batch(b, v, h, w, d, n_micro):
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import make_dtu_eval_batch

    rng = np.random.RandomState(0)
    imgs, cams, dv = make_dtu_eval_batch(b=b, v=v, h=h, w=w, dfull=d)
    batch = {"imgs": imgs, "cams": cams, "depth_values": dv,
             "depth_gt": {f"stage{i + 1}": rng.uniform(
                 450, 900, (b, h // (8 >> i), w // (8 >> i))).astype(np.float32)
                 for i in range(4)},
             }
    batch["mask"] = {k: (rng.rand(*g.shape) > 0.2).astype(np.float32)
                     for k, g in batch["depth_gt"].items()}
    if n_micro > 1:
        batch = {k: _split(v, n_micro) for k, v in batch.items()}
    return batch


def _split(tree, n):
    import jax

    return jax.tree.map(
        lambda x: x.reshape(n, x.shape[0] // n, *x.shape[1:]), tree)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/mvsformerplusplus.json")
    ap.add_argument("--batch-size", type=int, default=2,
                    help="per-process batch (global/chips in production)")
    ap.add_argument("--views", type=int, default=5)
    ap.add_argument("--num-depths", type=int, default=192)
    ap.add_argument("--buckets", default=None,
                    help="comma-separated bucket indices (default: all)")
    ap.add_argument("--repeat", action="store_true",
                    help="lower every bucket twice to report the warm path")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mvsformerplusplus_tpu.config import Config, build_model
    from mvsformerplusplus_tpu.train.optim import make_optimizer
    from mvsformerplusplus_tpu.train.step import (TrainState,
                                                  make_accum_train_step,
                                                  make_train_step)
    from mvsformerplusplus_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = Config(json.load(open(args.config)))
    msa = cfg["data_loader"][0]["args"].get("multi_scale_args", {})
    scales = msa.get("scales", [[512, 640]])
    sbm = {str(k): int(v) for k, v in msa.get("scale_batch_map", {}).items()}
    idxs = (list(range(len(scales))) if args.buckets is None
            else [int(i) for i in args.buckets.split(",")])

    model = build_model(cfg, dtype=jnp.bfloat16)
    tx = make_optimizer(total_steps=10000, warmup_steps=500)

    state = None
    totals = {"cold": 0.0, "warm": 0.0}
    for i in idxs:
        h, w = scales[i]
        micro = sbm.get(str(h), args.batch_size)
        n_micro = max(1, args.batch_size // micro) if micro else 1
        batch = build_batch(args.batch_size, args.views, h, w,
                            args.num_depths, n_micro)
        jb = jax.tree.map(jnp.asarray, batch)
        if state is None:
            im, cm, dv = ((jb["imgs"], jb["cams"], jb["depth_values"])
                          if n_micro == 1 else
                          (jb["imgs"][0], jax.tree.map(lambda x: x[0], jb["cams"]),
                           jb["depth_values"][0]))
            variables = jax.jit(lambda r: model.init(
                r, im, cm, dv, train=False))(jax.random.PRNGKey(0))
            state = TrainState.create(variables, tx)
        step = (make_train_step(model, tx) if n_micro == 1
                else make_accum_train_step(model, tx, n_micro))
        for phase in (("cold", "warm") if args.repeat else ("cold",)):
            t0 = time.time()
            jax.jit(step).lower(state, jb).compile()
            dt = time.time() - t0
            totals[phase] += dt
            print(f"bucket {i:>2} {h}x{w} micro={n_micro} [{phase}] "
                  f"compile {dt:7.1f}s", flush=True)
            if phase == "cold":
                jax.clear_caches()  # drop in-process jit cache; persistent
                # cache (disk) survives -> 'warm' measures ITS hit latency
    print(f"TOTAL cold {totals['cold']:.1f}s"
          + (f" warm {totals['warm']:.1f}s" if args.repeat else ""))
    return 0


if __name__ == "__main__":
    sys.exit(main())
