"""Per-process driver for the 2-process multi-host simulation test
(tests/test_multiprocess.py). Not a pytest file.

Each process owns 4 virtual CPU devices (XLA_FLAGS set by the parent) and
joins a jax.distributed cluster over local TCP, then runs the PRODUCTION
Trainer on a global (4 data x 2 cv) mesh:
  - host-sharded data loading (each process feeds a DIFFERENT local slice
    via make_global_batch / make_array_from_process_local_data);
  - a plain step and a micro-batch (grad-accumulation) step;
  - UNEVEN per-host validation (rank 0: 2 batches, rank 1: 1) through the
    host-local-mesh eval + (sum, n) allgather merge;
  - orbax checkpoint save from all processes + restore round-trip.
Writes a JSON result the parent compares across ranks.
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rank", type=int, required=True)
    ap.add_argument("--nprocs", type=int, default=2)
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--save_dir", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import jax

    jax.distributed.initialize(f"127.0.0.1:{args.port}", args.nprocs,
                               args.rank)
    import numpy as np

    repo = Path(__file__).resolve().parent.parent
    sys.path.insert(0, str(repo))
    from __graft_entry__ import _MemoryLoader, _make_batch
    from mvsformerplusplus_tpu.models.casmvs import CasMVSNet
    from mvsformerplusplus_tpu.parallel.mesh import make_mesh
    from mvsformerplusplus_tpu.train.optim import make_optimizer
    from mvsformerplusplus_tpu.train.trainer import Trainer

    assert jax.process_count() == args.nprocs
    n_cv = 2
    n_data = len(jax.devices()) // n_cv
    mesh = make_mesh(n_data=n_data, n_cv=n_cv)
    local_b = n_data // args.nprocs

    h, w = 64, 128
    v = 1 + n_cv
    # host-sharded loading: each process feeds a DIFFERENT slice
    plain = _make_batch(b=local_b, v=v, h=h, w=w, with_gt=True,
                        seed=100 + args.rank)
    big = _make_batch(b=2 * local_b, v=v, h=h, w=w, with_gt=True,
                      seed=200 + args.rank)
    model = CasMVSNet(feat_chs=(4, 8, 16, 32), groups=(4, 4, 4, 4),
                      ndepths=(8, 4, 4, 4), shard_views=True)
    tx = make_optimizer(total_steps=100, warmup_steps=5)
    loader = _MemoryLoader([(plain, (h, w)), (big, (h, w))])
    # uneven validation: rank 0 evaluates 2 batches, rank 1 only 1 — the
    # merge must weight by count and per-host eval must not deadlock
    val_batches = [
        (_make_batch(b=1, v=v, h=h, w=w, with_gt=True, seed=300 + k),
         (h, w))
        for k in range(2 - args.rank)
    ]
    trainer = Trainer(model, loader, _MemoryLoader(val_batches),
                      epochs=1, tx=tx, mesh=mesh, save_dir=args.save_dir,
                      scale_batch_map={str(h): local_b}, logging_every=1,
                      log_images=False)
    with jax.sharding.set_mesh(mesh):
        state = trainer.init_state(plain)
        state = trainer.train(state)
        jax.block_until_ready(state.params)
        val = trainer.validate(state)

        # checkpoint round-trip under multiple processes (orbax save ran
        # inside train(); restore into the live state template)
        restored, _meta = trainer.ckpt.restore(state, epoch=0)

    def checksum(tree):
        return float(sum(np.abs(np.asarray(x, np.float64)).sum()
                         for x in jax.tree.leaves(jax.device_get(tree))))

    result = {
        "rank": args.rank,
        "n_devices": len(jax.devices()),
        "n_local_val": len(val_batches),
        "val": {k: round(float(x), 6) for k, x in sorted(val.items())},
        "params_checksum": round(checksum(state.params), 4),
        "restored_checksum": round(checksum(restored.params), 4),
        "state_on_full_mesh": len(
            jax.tree.leaves(state.params)[0].sharding.device_set
        ) == len(jax.devices()),
    }
    Path(args.out).write_text(json.dumps(result))
    print("rank", args.rank, "done", flush=True)


if __name__ == "__main__":
    main()
