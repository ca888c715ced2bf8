"""Pre-flight warp-window validation for a dataset's camera geometry.

The banded-matmul warp (ops/pallas/warp_band.py) and the depth-folded
gather paths share source-image windows across pixel groups; samples whose
bilinear corners miss a window blend to zero (the out-of-FOV class). The
window sizes (StageNet.banded_ky / fold_ky / fold_wx) were chosen by
MEASURING escape fractions at the DTU protocol (tests/test_fold_window.py)
— a new dataset's cams (T&T, ETH3D, a COLMAP export) must be validated the
same way before a production run.

This tool runs the shipped escape diagnostics
(ops/grid_sample.banded_escape_fraction / fold_escape_fraction) over real
cam files at the cascade's scheduled hypothesis bands and prints a
go/no-go table per stage with a recommendation:

    python tools/validate_warp_windows.py --data /path/to/scan \
        [--pair pair.txt] [--num_views 5] [--ndepth 192] \
        [--interval_scale 1.06] [--resolution 1152x1536] [--samples 8]

Layout expected: standard MVSNet scan dir (cams/{idx:08d}_cam.txt +
pair.txt), the same files test.py consumes. Escapes <= 0.3% (the DTU
epipolar-degenerate class) -> OK; above that the tool recommends a taller
window or `warp_mode=folded` (exact per-sample gather) for the offending
stage via the config's model.args knobs.
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from mvsformerplusplus_tpu.data.io import (build_camera_stack, read_cam_file,
                                           read_pair_file, scale_intrinsics)
from mvsformerplusplus_tpu.ops.geometry import (compose_projection,
                                                plane_sweep_coords)
from mvsformerplusplus_tpu.ops.grid_sample import (banded_escape_fraction,
                                                   fold_escape_fraction)
from mvsformerplusplus_tpu.ops.sampling import (init_inverse_range,
                                                schedule_inverse_range)

# production plans (models/stagenet.py auto rules): (gy, ky) for the
# blocked banded path per stage channel width
STAGES = (
    # name, scale, ndepth, ratio, (gy, ky) banded plan, fold plan or None
    ("stage1", 8, 32, None, (8, 24), None),          # whole-row (W/8)
    ("stage2", 4, 16, 2.67, (2, 8), None),           # blocked C=32 auto
    ("stage3", 2, 8, 1.5, (2, 8), None),
    ("stage4", 1, 4, 1.0, (8, 16), None),
)
THRESH = 0.003  # the DTU epipolar-degenerate residual class


def load_scan(data_dir: str, pair_name: str, num_views: int,
              interval_scale: float):
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
    args = ap.parse_args()

    H, W = (int(v) for v in args.resolution.split("x"))
    nh, nw = (int(v) for v in args.native.split("x"))
    scans = load_scan(args.data, args.pair, args.num_views,
                      args.interval_scale)
    if not scans:
        print("no pairs found", file=sys.stderr)
        return 2
    idx = np.linspace(0, len(scans) - 1, min(args.samples, len(scans)))
    worst = {name: 0.0 for name, *_ in STAGES}

    for si in idx.astype(int):
        views, cams, dmin, ditv = scans[si]
        v = len(cams)
        stacks = {}
        for name, sc, *_ in STAGES:
            cam = np.zeros((1, v, 2, 4, 4), np.float32)
            for j, (intr, ext) in enumerate(cams):
                # test.py's convention: intrinsics scaled to the eval
                # resolution, then per-stage /8,/4,/2,/1
                k = intr.copy()
                k[0] *= W / nw
                k[1] *= H / nh
                cam[0, j] = build_camera_stack(
                    scale_intrinsics(k, 1.0 / sc), ext)
            stacks[name] = cam

        dv = jnp.asarray(
            (dmin + np.arange(args.ndepth, dtype=np.float32) * ditv)[None])
        hypo = init_inverse_range(dv, 32, H // 8, W // 8)
        for name, sc, nd, ratio, (gy, ky), _ in STAGES:
            h, w = H // sc, W // sc
            if ratio is not None:
                hypo = schedule_inverse_range(
                    hypo[:, hypo.shape[1] // 2], hypo, nd, ratio, h, w)
            proj = compose_projection(jnp.asarray(stacks[name]))
            block_w = 128 if (w % 128 == 0 and w >= 384) else 0
            kk = ky if block_w else max(ky, 24)
            for vi in range(1, v):
                coords, _ = plane_sweep_coords(
                    proj[:, vi], proj[:, 0], hypo, h, w)
                esc = banded_escape_fraction(
                    np.asarray(coords), h, w, gy=gy, ky=kk, block_w=block_w)
                worst[name] = max(worst[name], esc)

    print(f"{'stage':8s} {'plan':16s} {'worst escape':>12s}  verdict")
    bad = False
    for name, sc, nd, ratio, (gy, ky), _ in STAGES:
        w = W // sc
        block_w = 128 if (w % 128 == 0 and w >= 384) else 0
        kk = ky if block_w else max(ky, 24)
        plan = f"gy={gy} ky={kk} {'blk' if block_w else 'row'}"
        ok = worst[name] <= THRESH
        bad |= not ok
        verdict = ("OK" if ok else
                   "ESCAPES — raise banded_ky or set warp_mode=folded")
        print(f"{name:8s} {plan:16s} {worst[name]:12.5f}  {verdict}")
    if bad:
        print("\nRecommendation: set model.args.warp_mode='folded' (exact "
              "per-sample gather) for this dataset, or raise banded_ky and "
              "re-run this check.", file=sys.stderr)
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
