"""Op-level attribution of the flagship eval forward on TPU.

Two modes:

  python tools/profile_eval.py            # trace + parse: top ops by self-time
  python tools/profile_eval.py --components   # jit each subsystem separately

Mode 1 runs ONE compiled DTU-eval forward under jax.profiler.trace and rolls
the xprof framework_op_stats up into a category table (warp gather / blend
kernel / convs / attention / transposes / ...) — the tool the optimization
loop is driven by (reference has only wall-clock timing, test.py:239-262).

Parsing needs PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python; the script
re-execs itself with it set (and keeps the axon env for the TPU run).
"""
from __future__ import annotations

import argparse
import glob
import os
import sys
import time

if os.environ.get("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION") != "python":
    os.environ["PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION"] = "python"
    os.execv(sys.executable, [sys.executable] + sys.argv)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _bench_inputs(jnp):
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import make_dtu_eval_batch
    import jax
    imgs, cams, dv = make_dtu_eval_batch()
    return jnp.asarray(imgs), jax.tree.map(jnp.asarray, cams), jnp.asarray(dv)


def run_trace(outdir: str, iters: int = 1):
    import jax
    import jax.numpy as jnp
    from mvsformerplusplus_tpu.models.mvsformer import DINOv2MVSNet
    from mvsformerplusplus_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    imgs, cams, dv = _bench_inputs(jnp)
    model = DINOv2MVSNet(dtype=jnp.bfloat16, remat_stages=False)
    variables = jax.jit(lambda r: model.init(r, imgs, cams, dv, train=False))(
        jax.random.PRNGKey(0))
    fwd = jax.jit(
        lambda v, i: model.apply(v, i, cams, dv, train=False)["refined_depth"])
    t0 = time.time()
    out = jax.block_until_ready(fwd(variables, imgs))
    print(f"compile+first run: {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    jax.block_until_ready(fwd(variables, imgs))
    print(f"steady-state: {(time.time() - t0) * 1000:.0f} ms/map", flush=True)

    jax.profiler.start_trace(outdir)
    for _ in range(iters):
        out = fwd(variables, imgs)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    print(f"trace written to {outdir}", flush=True)


CATEGORIES = (
    ("gather", "warp gather"),
    ("scatter", "warp scatter (bwd)"),
    ("blend", "pallas blend kernel"),
    ("flash", "pallas flash attention"),
    # pallas kernels show up as <module-path>/pallas_call; the kernel
    # families are distinguished by their module path
    ("attn/pallas_call", "pallas flash attention"),
    ("build_volume/pallas_call", "pallas warp kernel"),
    ("_build_volume_impl/pallas_call", "pallas warp kernel"),
    ("smooth", "convolutions"),
    ("conv", "convolutions"),
    ("dot", "matmuls"),
    ("einsum", "matmuls"),
    ("transpose", "transposes/relayout"),
    ("copy", "transposes/relayout"),
    ("reshape", "transposes/relayout"),
    ("softmax", "softmax/reduce"),
    ("reduce", "softmax/reduce"),
    ("dynamic-update", "dus/while"),
    ("dynamic_update", "dus/while"),
    ("while", "dus/while"),
    ("convert", "dtype converts"),
    ("pad", "pad"),
)


def parse_trace(outdir: str, top: int = 40):
    import json

    from xprof.convert import raw_to_tool_data as r2t

    xp = sorted(glob.glob(f"{outdir}/plugins/profile/*/*.xplane.pb"))
    if not xp:
        print(f"no xplane.pb under {outdir}", file=sys.stderr)
        return 1
    data, _ = r2t.xspace_to_tool_data([xp[-1]], "framework_op_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    # gviz JSON: [{cols: [{id, label}...], rows: [{c: [{v}...]}...]}, ...]
    # (first table = ALL ops incl. IDLE, second = excluding IDLE). Use the
    # IDLE-EXCLUDING table so op percentages attribute real device time
    # (IDLE gaps in a 1-iteration trace would otherwise dilute every op).
    tables = json.loads(data)
    tab = tables[1] if len(tables) > 1 else tables[0]
    ids = [c["id"] for c in tab["cols"]]
    rows = [
        {ids[i]: (cell or {}).get("v") for i, cell in enumerate(r["c"])}
        for r in tab["rows"]
    ]

    def f(row, key):
        try:
            return float(row.get(key) or 0)
        except (ValueError, TypeError):
            return 0.0

    dev = [r for r in rows
           if str(r.get("host_or_device", "")).lower() == "device"]
    dev.sort(key=lambda r: -f(r, "total_self_time"))
    total = sum(f(r, "total_self_time") for r in dev)
    print(f"\n== top {top} device ops by self time (total {total/1e3:.1f} ms) ==")
    cats: dict = {}
    for r in dev:
        st = f(r, "total_self_time")
        name = str(r.get("operation", "?"))
        cat = "other"
        low = name.lower()
        for key, c in CATEGORIES:
            if key in low:
                cat = c
                break
        cats[cat] = cats.get(cat, 0.0) + st
    for i, r in enumerate(dev[:top]):
        st = f(r, "total_self_time")
        occ = int(f(r, "occurrences"))
        bw = f(r, "measured_memory_bw")
        bound = r.get("bound_by", "?")
        print(f"{st/1e3:9.2f} ms {100*st/max(total,1):5.1f}%  x{occ:>7}  "
              f"{bw:7.0f} GB/s {bound:>8}  {str(r.get('operation', '?'))[:80]}")
    print("\n== category rollup ==")
    for c, st in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"{st/1e3:9.2f} ms {100*st/max(total,1):5.1f}%  {c}")
    return 0


def run_components(only: str = ""):
    """Time each stage's build_volume at DTU eval scale across warp
    variants: 'folded' (exact single-gather baseline), 'pallas' with
    fold_depth off, and 'pallas' with the depth-folded patch (production
    default on fine stages) — plus a wide-group (gy=16/ky=32) pallas
    variant. One invocation = the whole warp ablation."""
    import jax
    import jax.numpy as jnp
    from mvsformerplusplus_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.RandomState(0)
    DT = jnp.bfloat16
    B, V, H, W = 1, 5, 1152, 1536

    def bench(name, fn, *args, iters=3):
        f = jax.jit(fn)
        jax.block_until_ready(f(*args))
        t0 = time.time()
        for _ in range(iters):
            out = f(*args)
        jax.block_until_ready(out)
        print(f"{name:52s} {(time.time()-t0)/iters*1000:8.1f} ms", flush=True)

    import flax.linen as nn

    from bench import make_dtu_eval_batch
    from mvsformerplusplus_tpu.models.stagenet import StageNet

    imgs, cams, dv = make_dtu_eval_batch()
    cams = {k: jnp.asarray(v) for k, v in cams.items()}
    # per-stage feature pyramids at production channel widths
    feat_chs = {"stage1": 64, "stage2": 32, "stage3": 16, "stage4": 8}
    ndepths = {"stage1": 32, "stage2": 16, "stage3": 8, "stage4": 4}
    scales = {"stage1": 8, "stage2": 4, "stage3": 2, "stage4": 1}
    itv = float(dv[0, 1] - dv[0, 0])

    def vol_module(d, mode, fold, gy=8, ky=16, max_c=16, budget=1 << 30,
                   banded_ky=16, banded_fused=False):
        class VolOnly(nn.Module):
            @nn.compact
            def __call__(self, f, cam, dvv):
                st = StageNet(
                    ndepth=d, groups=8, cost_reg_type="Normal",
                    depth_type="ce", warp_mode=mode, fold_depth=fold,
                    xgrouped_gx=gy, grouped_warp_kx=ky, banded_ky=banded_ky,
                    banded_fused=banded_fused, banded_max_c=max_c,
                    # band-sharing a D=16 band needs the gate open up to 16
                    grouped_warp_th=(d if (fold or mode == "grouped") else 8),
                    pallas_max_c=max_c, warp_patch_budget=budget, dtype=DT,
                )
                # measure the PRODUCTION output convention (folded handoff
                # on TPU) without build_volume's external-caller unfold
                vol, _fd = st._build_volume_impl(f, cam, dvv, False)
                return vol

        return VolOnly()

    for s in ("stage1", "stage2", "stage3", "stage4"):
        c, d, sc = feat_chs[s], ndepths[s], scales[s]
        h, w = H // sc, W // sc
        feats = jnp.asarray(
            rng.rand(B, V, h, w, c).astype(np.float32)).astype(DT)
        if s == "stage1":
            dvals = jnp.asarray(dv[:, :d])
        else:
            # re-centered per-pixel band, DTU-like interval for the stage
            ctr = jnp.asarray(
                rng.uniform(500, 800, (B, h, w)).astype(np.float32))
            offs = (jnp.arange(d, dtype=jnp.float32) - d / 2) * (itv * sc)
            dvals = ctr[:, None] + offs[None, :, None, None]

        # r4 ablation set: the exact single-gather baseline, the r3 banded
        # default (ky=24), the r4 default (ky=16; at C=16 the StageNet auto
        # plan turns it into gy=2/ky=8), and a gy=4/ky=16 midpoint that
        # bypasses the auto plan. (r3's full pallas/grouped sweep is
        # committed in docs/profiles/.)
        variants = [
            ("folded", "folded", False, 8, 16, 16, 1 << 30, 16, False),
            ("banded ky24 (r3)", "banded", False, 8, 16, 64,
             1 << 30, 24, False),
            ("banded ky16/auto (r4)", "banded", False, 8, 16, 64,
             1 << 30, 16, False),
            ("banded ky16/auto fused", "banded", False, 8, 16, 64,
             1 << 30, 16, True),
            # gy=2/ky=8 fused at every blocked stage incl. C=32 stage2
            # (zero escapes at the DTU protocol geometry; NB the r4
            # StageNet gate demotes C>16 in production — this row is the
            # measurement that decides whether to raise banded_max_c)
            ("banded gy2ky8 fused", "banded", False, 2, 16, 64,
             1 << 30, 8, True),
            ("banded gy4ky16", "banded", False, 4, 16, 64,
             1 << 30, 16, False)]
        for label, mode, fold, gy, ky, max_c, budget, bky, bfu in variants:
            if only and only not in label:
                continue
            m = vol_module(d, mode, fold, gy, ky, max_c, budget,
                           banded_ky=bky, banded_fused=bfu)
            try:
                vars_ = jax.jit(m.init)(
                    jax.random.PRNGKey(0), feats, cams[s], dvals)
                bench(f"{s} build_volume [{label}]",
                      lambda f_, cv_, dv_, m=m, v=vars_:
                      m.apply(v, f_, cv_, dv_),
                      feats, cams[s], dvals)
            except Exception as e:  # a gated-off variant: report, continue
                print(f"{s} build_volume [{label}]: skipped ({e})",
                      flush=True)

    print("DONE", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default="/tmp/xprof_eval")
    ap.add_argument("--parse-only", action="store_true")
    ap.add_argument("--components", action="store_true")
    ap.add_argument("--only", default="",
                    help="substring filter on component variant labels")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()
    if args.components:
        run_components(args.only)
        return 0
    if not args.parse_only:
        run_trace(args.outdir)
    return parse_trace(args.outdir, args.top)


if __name__ == "__main__":
    sys.exit(main())
