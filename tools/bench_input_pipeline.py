"""Input-pipeline overlap benchmark (host prefetch vs device step).

The reference's training cost is dominated by device compute only if the
torch DataLoader keeps up (num_workers=4-8 on 4 GPUs, train.py); our
TrainLoader overlaps disk I/O + decode + aug with the TPU step through a
thread pool. This tool measures whether it actually keeps up:

- generates a synthetic DTU scene set on disk (full-size 1200x1600 images
  by default — decode cost matters),
- iterates TrainLoader at the DTU MS training protocol,
- reports producer throughput (batches/s with no consumer delay), consumer
  stall time at a simulated device step time, and overlap efficiency.

  python tools/bench_input_pipeline.py --step-ms 900 --steps 40

Prints one JSON line. Pure host benchmark (no TPU needed).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default=None,
                    help="existing DTU-layout dir (default: synth tmp)")
    ap.add_argument("--h", type=int, default=1200)
    ap.add_argument("--w", type=int, default=1600)
    ap.add_argument("--scans", type=int, default=2)
    ap.add_argument("--batch-size", type=int, default=2)
    ap.add_argument("--nviews", type=int, default=5)
    ap.add_argument("--num-workers", type=int, default=4)
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--step-ms", type=float, default=900.0,
                    help="simulated device step time (BENCH train s_per_step)")
    args = ap.parse_args()

    from mvsformerplusplus_tpu.data.loader import TrainLoader
    from mvsformerplusplus_tpu.data.mvs_dataset import DTUTrainDataset
    from mvsformerplusplus_tpu.data.synthetic import make_synthetic_dtu

    tmp = None
    if args.data is None:
        tmp = tempfile.TemporaryDirectory(prefix="ipbench_")
        root = Path(tmp.name) / "dtu"
        t0 = time.time()
        make_synthetic_dtu(root, n_scans=args.scans, n_lights=7,
                           h=args.h, w=args.w)
        gen_s = time.time() - t0
    else:
        root, gen_s = Path(args.data), 0.0

    ds = DTUTrainDataset(str(root), str(root / "train.txt"), mode="train",
                         nviews=args.nviews, ndepths=192,
                         random_crop=True, augment=True)
    # DTU MS protocol crop scales (a representative subset)
    scales = [(512, 640), (512, 704), (576, 768)]
    loader = TrainLoader(ds, args.batch_size, scales,
                         num_workers=args.num_workers, seed=0)

    def run(consumer_s: float, steps: int):
        """Iterate; returns (per-batch wait times, total wall)."""
        waits, n = [], 0
        t_start = time.time()
        it = loader.epoch(0)
        while n < steps:
            t0 = time.time()
            try:
                batch, hw = next(it)
            except StopIteration:
                it = loader.epoch(n)  # re-epoch to reach `steps`
                continue
            waits.append(time.time() - t0)
            n += 1
            if consumer_s:
                time.sleep(consumer_s)  # the simulated device step
        return waits, time.time() - t_start

    # producer-only throughput (consumer never sleeps)
    w0, wall0 = run(0.0, args.steps)
    producer_bps = args.steps / wall0

    # overlapped run at the simulated device step time
    step_s = args.step_ms / 1e3
    w1, wall1 = run(step_s, args.steps)
    stall = sum(max(0.0, t) for t in w1[1:])  # first batch = warmup fill
    ideal = step_s * (args.steps - 1)
    overlap_eff = ideal / (ideal + stall) if ideal else 1.0

    print(json.dumps({
        "producer_batches_per_sec": round(producer_bps, 3),
        "producer_ms_per_batch": round(1e3 / producer_bps, 1),
        "consumer_step_ms": args.step_ms,
        "stall_ms_per_step": round(1e3 * stall / max(1, args.steps - 1), 2),
        "overlap_efficiency": round(overlap_eff, 4),
        "keeps_up": bool(1e3 / producer_bps <= args.step_ms),
        "p95_wait_ms": round(1e3 * float(np.percentile(w1[1:], 95)), 1),
        "protocol": (f"B={args.batch_size} {args.nviews}views "
                     f"{args.h}x{args.w} raw, crops {scales}, "
                     f"{args.num_workers} workers"),
        "synth_gen_s": round(gen_s, 1),
    }))
    if tmp:
        tmp.cleanup()
    return 0


if __name__ == "__main__":
    sys.exit(main())
