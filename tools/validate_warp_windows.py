"""Pre-flight warp-window validation for a dataset's camera geometry.

The banded-matmul warp (ops/pallas/warp_band.py) and the depth-folded
gather paths share source-image windows across pixel groups; samples whose
bilinear corners miss a window blend to zero (the out-of-FOV class). The
window plans were chosen by MEASURING escape fractions at the DTU protocol
(tests/test_fold_window.py) — a new dataset's cams (T&T, ETH3D, a COLMAP
export) must be validated the same way before a production run.

This tool resolves the EXACT per-stage plans StageNet will run (via
ops/window_check.scan_window_report -> models/stagenet.resolve_warp_plan —
the same code path test.py's per-scan enforcement uses) over real cam
files and prints a go/no-go table per stage:

    python tools/validate_warp_windows.py --data /path/to/scan \
        [--pair pair.txt] [--num_views 5] [--ndepth 192] \
        [--interval_scale 1.06] [--resolution 1152x1536] [--samples 8] \
        [--train]   # also check the banded backward (gradient) windows

Layout expected: standard MVSNet scan dir (cams/{idx:08d}_cam.txt +
pair.txt), the same files test.py consumes. Escapes <= 0.3% (the DTU
epipolar-degenerate class) -> OK; above that the tool recommends a taller
window or `warp_mode=folded` (exact per-sample gather) for the offending
stage via the config's model.args knobs. Exit code 1 on any failure.

Note test.py now ALSO runs this check per scan and auto-falls back
offending stages (--window_check auto); this tool remains the standalone
pre-flight for training runs and CI.
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_scan(data_dir: str, pair_name: str, num_views: int,
              interval_scale: float):
    from mvsformerplusplus_tpu.data.io import read_cam_file, read_pair_file

    pair_path = os.path.join(data_dir, pair_name)
    if not os.path.exists(pair_path):
        pair_path = os.path.join(data_dir, "pair.txt")
    pairs = read_pair_file(pair_path)
    cam_dir = os.path.join(data_dir, "cams")
    out = []
    for ref, srcs in pairs:
        views = [ref] + list(srcs)[: num_views - 1]
        cams, dmin, ditv = [], None, None
        for vi in views:
            intr, ext, depth_min, depth_interval, _ = read_cam_file(
                os.path.join(cam_dir, f"{vi:08d}_cam.txt"),
                interval_scale=interval_scale)
            cams.append((intr, ext))
            if vi == ref:
                dmin, ditv = depth_min, depth_interval
        out.append((views, cams, dmin, ditv))
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True, help="scan dir (cams/ + pair)")
    ap.add_argument("--pair", default="pair.txt")
    ap.add_argument("--num_views", type=int, default=5)
    ap.add_argument("--ndepth", type=int, default=192)
    ap.add_argument("--interval_scale", type=float, default=1.06)
    ap.add_argument("--resolution", default="1152x1536",
                    help="eval HxW (the resize test.py applies)")
    ap.add_argument("--native", default="1200x1600",
                    help="native cam HxW the intrinsics were written for")
    ap.add_argument("--samples", type=int, default=8,
                    help="reference views sampled per scan")
    ap.add_argument("--warp_mode", default="banded",
                    help="mode to validate ('banded' = the TPU production "
                         "default; 'auto' resolves per backend)")
    ap.add_argument("--train", action="store_true",
                    help="also validate the banded BACKWARD (gradient) "
                         "windows used when training at this geometry")
    ap.add_argument("--ndepths", default="32,16,8,4")
    ap.add_argument("--feat_chs", default="8,16,32,64")
    args = ap.parse_args()

    from mvsformerplusplus_tpu.data.io import (build_camera_stack,
                                               scale_intrinsics)
    from mvsformerplusplus_tpu.models.casmvs import CasMVSNet
    from mvsformerplusplus_tpu.ops.window_check import (DEFAULT_THRESH,
                                                        scan_window_report)

    H, W = (int(v) for v in args.resolution.split("x"))
    nh, nw = (int(v) for v in args.native.split("x"))
    ndepths = tuple(int(v) for v in args.ndepths.split(","))
    feat_chs = tuple(int(v) for v in args.feat_chs.split(","))
    scans = load_scan(args.data, args.pair, args.num_views,
                      args.interval_scale)
    if not scans:
        print("no pairs found", file=sys.stderr)
        return 2

    # a model carrier for the cascade/warp fields — the checker reads its
    # plan exactly as StageNet would resolve it
    model = CasMVSNet(feat_chs=feat_chs, ndepths=ndepths,
                      warp_mode=args.warp_mode)

    idx = np.linspace(0, len(scans) - 1, min(args.samples, len(scans)))
    worst = None
    for si in idx.astype(int):
        views, cams, dmin, ditv = scans[si]
        v = len(cams)
        stacks = {}
        for i in range(len(ndepths)):
            sc = 2 ** (len(ndepths) - 1 - i)
            cam = np.zeros((1, v, 2, 4, 4), np.float32)
            for j, (intr, ext) in enumerate(cams):
                # test.py's convention: intrinsics scaled to the eval
                # resolution, then per-stage /8,/4,/2,/1
                k = intr.copy()
                k[0] *= W / nw
                k[1] *= H / nh
                cam[0, j] = build_camera_stack(
                    scale_intrinsics(k, 1.0 / sc), ext)
            stacks[f"stage{i + 1}"] = cam
        dv = (dmin + np.arange(args.ndepth, dtype=np.float32)
              * ditv)[None]
        reports = scan_window_report(model, stacks, dv, H, W,
                                     train=args.train,
                                     row_group_stride=2)
        if worst is None:
            worst = reports
        else:
            for wr, r in zip(worst, reports):
                if r.escape_fwd > wr.escape_fwd:
                    wr.escape_fwd = r.escape_fwd
                if r.escape_bwd > wr.escape_bwd:
                    wr.escape_bwd = r.escape_bwd
                wr.ok = wr.ok and r.ok

    print(f"{'stage':8s} {'plan':22s} {'fwd escape':>11s} "
          f"{'bwd escape':>11s}  verdict")
    bad = False
    for r in worst:
        plan = (f"{r.mode} gy={r.gy} ky={r.ky} "
                f"{'blk' if r.blocked else 'row'}{' fold' if r.fold else ''}")
        bad |= not r.ok
        verdict = ("OK" if r.ok else
                   "ESCAPES — raise banded_ky or set warp_mode=folded")
        print(f"{r.stage:8s} {plan:22s} {r.escape_fwd:11.5f} "
              f"{r.escape_bwd:11.5f}  {verdict}")
    if bad:
        print("\nRecommendation: set model.args.warp_mode='folded' (exact "
              "per-sample gather) for this dataset (plus banded_bwd=false "
              "if the bwd column fails), or raise banded_ky and re-run "
              f"this check (threshold {DEFAULT_THRESH}).", file=sys.stderr)
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
