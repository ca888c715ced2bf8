"""T&T-geometry stress for the warp-window plans (no real T&T data on box).

The reference's Tanks&Temples protocol is 20 views at 1088x1920 with
wide-baseline hand-held rigs (scripts/test_tt_inter.sh:3-54) — the camera
class that stresses shared warp-window plans hardest (strong yaw between
ref and far sources, per-view roll). Real T&T cams are not on this box, so
this tool synthesizes the geometry class instead (data/synthetic.py
tnt_cameras over the analytic scene) and drives:

  1. tools/validate_warp_windows.py — the standalone pre-flight go/no-go
     table (forward + backward windows);
  2. test.py at the full T&T protocol shape with --window_check auto —
     demonstrating the per-scan enforcement path end-to-end (and, with
     --ckpt from an e2e-protocol run on the same analytic scene, that end
     depth metrics survive the fallback);
  3. writes docs/tt_stress.md with the tables.

    python tools/stress_tt.py [--root /tmp/tt_stress] [--views 20]
        [--resolution 1088x1920] [--ckpt /tmp/e2e_protocol/casmvs/saved/checkpoints
         --config /tmp/e2e_protocol/casmvs/cfg.json]
"""
from __future__ import annotations

import argparse
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/tt_stress")
    ap.add_argument("--views", type=int, default=20)
    ap.add_argument("--resolution", default="1088x1920")
    ap.add_argument("--ndepth", type=int, default=192)
    ap.add_argument("--ckpt", default=None,
                    help="checkpoint dir for the eval-CLI leg (e.g. the "
                         "e2e-protocol casmvs run — same analytic scene)")
    ap.add_argument("--config", default=None,
                    help="model config matching --ckpt")
    ap.add_argument("--skip-eval", action="store_true",
                    help="only render + window validation (no TPU eval)")
    args = ap.parse_args()

    H, W = (int(v) for v in args.resolution.split("x"))
    root = Path(args.root)
    sd = root / "scan_tt"
    lines = [
        "# T&T-geometry stress (synthetic wide-baseline rig)", "",
        f"Rig: {args.views} views, {H}x{W}, +-40deg yaw arc, +-22deg "
        "height, +-10deg roll (data/synthetic.py tnt_cameras) over the "
        "analytic quad scene — the reference T&T protocol's geometry "
        "class (scripts/test_tt_inter.sh). No real T&T cams exist on this "
        "box; this is the documented stand-in pre-flight.", "",
    ]

    if not (sd / "pair.txt").exists():
        print(f"rendering {args.views} views at {H}x{W}...", flush=True)
        from mvsformerplusplus_tpu.data.synthetic import (
            GeometricScene, make_geometric_eval_scan, tnt_cameras)

        scene = GeometricScene(0, tex_res=4096)
        make_geometric_eval_scan(
            root, scan="scan_tt", n_views=args.views, h=H, w=W,
            ndepth=args.ndepth, scene=scene,
            cameras=tnt_cameras(args.views, H, W))

    env = dict(os.environ, PYTHONPATH=os.pathsep.join(
        [str(REPO), os.environ.get("PYTHONPATH", "")]))

    # 1. standalone pre-flight (forward + backward windows)
    r = subprocess.run(
        [sys.executable, str(REPO / "tools" / "validate_warp_windows.py"),
         "--data", str(sd), "--num_views", "11",
         "--ndepth", str(args.ndepth), "--resolution", f"{H}x{W}",
         "--native", f"{H}x{W}", "--samples", "6", "--train"],
        env=dict(env, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS=""),
        cwd=str(REPO), capture_output=True, text=True)
    lines += ["## validate_warp_windows.py (eval res, --train)", "",
              "```", r.stdout.strip(), r.stderr.strip(), "```",
              f"exit code: {r.returncode} "
              f"({'all plans OK' if r.returncode == 0 else 'ESCAPES -> '
                 'per-scan fallback / folded mode required'})", ""]
    print(r.stdout, r.stderr, flush=True)

    # 2. full eval CLI at the T&T protocol shape with per-scan enforcement
    if not args.skip_eval:
        (root / "list.txt").write_text("scan_tt\n")
        cfg = args.config
        if cfg is None:
            import json

            cfg = str(root / "cfg.json")
            Path(cfg).write_text(json.dumps({"arch": {"args": {
                "model_type": "casmvs",
                "feat_chs": [8, 16, 32, 64], "base_ch": [8, 8, 8, 8],
                "ndepths": [32, 16, 8, 4],
                "depth_interals_ratio": [4.0, 2.67, 1.5, 1.0],
                "depth_type": ["ce"] * 4, "inverse_depth": True,
                "cost_reg_type": ["Normal"] * 4,
            }}}))
        cmd = [sys.executable, str(REPO / "test.py"),
               "--config", cfg,
               "--testpath", str(root), "--testlist", str(root / "list.txt"),
               "--outdir", str(root / "out"),
               "--gt_depth_path", str(root / "gt_depths"),
               "--dataset", "tt",
               "--num_view", "11", "--numdepth", str(args.ndepth),
               "--max_h", str(H), "--max_w", str(W),
               "--filter_method", "dpcd", "--conf", "0.3",
               "--fusion_view", "10", "--conf_choose", "stage4"]
        if args.ckpt:
            cmd += ["--ckpt", args.ckpt]
        r = subprocess.run(cmd, env=env, cwd=str(REPO),
                           capture_output=True, text=True)
        tail = "\n".join((r.stdout + r.stderr).splitlines()[-40:])
        win = [ln for ln in (r.stdout + r.stderr).splitlines()
               if "window check" in ln or "falling back" in ln]
        lines += ["## test.py at the T&T protocol "
                  f"(11 views used, {H}x{W}, --window_check auto)", "",
                  "```", *win, "```", ""]
        metric_txt = root / "out" / "depth_metric.txt"
        if metric_txt.exists():
            lines += ["depth metrics vs analytic GT "
                      f"({'trained ckpt' if args.ckpt else 'RANDOM weights'}):",
                      "", "```", metric_txt.read_text().strip(), "```", ""]
        lines += [f"test.py exit code: {r.returncode}", ""]
        if r.returncode != 0:
            lines += ["```", tail, "```"]
        print(tail, flush=True)

    out = REPO / "docs" / "tt_stress.md"
    out.write_text("\n".join(lines) + "\n")
    print("wrote", out, flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
