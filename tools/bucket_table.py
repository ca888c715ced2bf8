"""Per-bucket train-step feasibility table on one chip.

The reference trains 25 crop buckets 512x640..1024x1280 with micro-batch
2-4 by crop height (config/mvsformer++.json:159-169 scale_batch_map;
datasets/dtu_dataset_ms.py:112-127). This tool determines OUR documented
per-bucket micro-batch sizes on the local chip: for each crop-HEIGHT
class it compiles + steps the production flagship train step (frozen
DINOv2-B, 5 views, 192 depths, remat=cost_reg, bf16) at the class's
WIDEST bucket (worst case W — if that fits, every bucket of the class
fits) at descending micro-batch candidates, recording compile result and
step time.

    python tools/bucket_table.py [--out docs/bucket_table.md]
        [--heights 512,576,...]

Writes the markdown table plus the resulting scale_batch_map JSON line to
paste into configs. Budget ~1-2 min compile per (height, B) try (warm
cache makes re-runs fast).
"""
from __future__ import annotations

import argparse
import json
import sys
import time
import traceback
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np

# widest bucket per height class (configs/mvsformerplusplus.json scales)
WIDEST = {512: 768, 576: 832, 640: 960, 704: 1024, 768: 1088, 832: 1152,
          896: 1280, 960: 1344, 1024: 1280}
# candidates: the reference's map starts at 4 below 768-high crops, 2
# above.  On one v5e, B=4 at the SMALLEST class's widest bucket already
# exceeds HBM (512x768 B=4: 18.85G of 15.75G, /tmp/bucket_table.log
# r5) — activation memory grows monotonically in H*W, so B=4 is ruled
# out a fortiori for every larger class and we only document that
# failure once, at 512.
CANDIDATES = {h: ([4, 2, 1] if h == 512 else [2, 1]) for h in WIDEST}


def try_bucket(jax, jnp, h: int, w: int, b: int, remat: str = "cost_reg"):
    from bench import make_train_batch
    from mvsformerplusplus_tpu.models.mvsformer import DINOv2MVSNet
    from mvsformerplusplus_tpu.train.optim import make_optimizer
    from mvsformerplusplus_tpu.train.step import TrainState, make_train_step

    batch = make_train_batch(b=b, h=h, w=w)
    model = DINOv2MVSNet(dtype=jnp.bfloat16, remat_stages=True,
                         remat_granularity=remat)
    tx = make_optimizer(total_steps=10000, warmup_steps=500, freeze_vit=True)
    jb = jax.tree.map(jnp.asarray, batch)
    variables = jax.jit(
        lambda r: model.init(r, jb["imgs"], jb["cams"], jb["depth_values"],
                             train=False))(jax.random.PRNGKey(0))
    state = TrainState.create(variables, tx)
    step = make_train_step(model, tx)
    t0 = time.time()
    compiled = jax.jit(step, donate_argnums=0).lower(state, jb).compile()
    compile_s = time.time() - t0
    state, logs = compiled(state, jb)
    jax.block_until_ready(logs["loss"])
    # Force a HOST transfer of the loss every iteration: through the axon
    # relay, block_until_ready on a device scalar returns early (both the
    # 3-iter and 10-iter block_until_ready forms of this loop reported
    # 0.012-0.014 s/step for steps bench.py measures at ~0.5 s), but a
    # float() readback cannot complete before the step that produced it.
    iters = 10
    t0 = time.time()
    for _ in range(iters):
        state, logs = compiled(state, jb)
        float(logs["loss"])
    dt = (time.time() - t0) / iters
    finite = bool(np.isfinite(float(logs["loss"])))
    del state, compiled, variables, jb
    return {"compile_s": round(compile_s, 1), "s_per_step": round(dt, 3),
            "samples_per_s": round(b / dt, 2), "loss_finite": finite}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=str(REPO / "docs" / "bucket_table.md"))
    ap.add_argument("--heights", default=None,
                    help="comma list (default: all 9 height classes)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mvsformerplusplus_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    kind = jax.devices()[0].device_kind

    heights = ([int(x) for x in args.heights.split(",")] if args.heights
               else sorted(WIDEST))
    rows = []
    batch_map = {}
    def write_table():
        write_out(args.out, kind, rows, batch_map)

    for h in heights:
        w = WIDEST[h]
        # remat fallback AFTER all plain batch sizes: cost_reg granularity
        # is the measured-right default (stage granularity replays the
        # volume build, docs/profiles/r4_train_arc.txt), so a class only
        # escalates to remat=stage once even micro-batch 1 misses HBM
        # (1024x1280 B=1: 15.98G of 15.75G).  The winning (B, remat) pair
        # is what configs/ documents via scale_batch_map + remat_map.
        tries = ([(b, "cost_reg") for b in CANDIDATES[h]]
                 + [(b, "stage") for b in CANDIDATES[h] if b < 4])
        for b, remat in tries:
            label = b if remat == "cost_reg" else f"{b} (remat=stage)"
            print(f"trying {h}x{w} B={b} remat={remat}...", flush=True)
            try:
                r = try_bucket(jax, jnp, h, w, b, remat)
                rows.append((h, w, label, "ok", r))
                batch_map[str(h)] = (b if remat == "cost_reg"
                                     else {"batch": b, "remat": remat})
                print(f"  ok: {r}", flush=True)
                write_table()  # incremental: a killed run keeps its rows
                break
            except Exception as e:
                msg = str(e).splitlines()[0][:110]
                rows.append((h, w, label, f"FAIL: {msg}", None))
                print(f"  fail: {msg}", flush=True)
                traceback.print_exc(limit=1)
                write_table()

    write_table()
    print("wrote", args.out, flush=True)
    print(json.dumps(batch_map))
    return 0


def write_out(out, kind, rows, batch_map):
    lines = [
        "# Train-bucket feasibility (one chip)", "",
        f"Device: {kind}. Production flagship train step (frozen DINOv2-B, "
        "5 views, 192 depths, remat=cost_reg, bf16), measured at each "
        "height class's WIDEST bucket (if that fits, every bucket of the "
        "class fits). Reference protocol: micro-batch 4 below 768-high "
        "crops, 2 above (config/mvsformer++.json scale_batch_map).", "",
        "| crop (widest of class) | micro-batch | result | compile s | "
        "s/step | samples/s |",
        "|---|---|---|---|---|---|",
    ]
    for h, w, b, status, r in rows:
        if r:
            lines.append(f"| {h}x{w} | {b} | {status} | {r['compile_s']} | "
                         f"{r['s_per_step']} | {r['samples_per_s']} |")
        else:
            lines.append(f"| {h}x{w} | {b} | {status} | — | — | — |")
    lines += ["", "Resulting per-chip scale_batch_map:", "",
              "```json", json.dumps(batch_map), "```", ""]
    Path(out).write_text("\n".join(lines) + "\n")


if __name__ == "__main__":
    sys.exit(main())
