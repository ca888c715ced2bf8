"""End-to-end accuracy oracle on an ANALYTIC multi-view scene.

The reference verifies its pipeline empirically on real DTU scans
(test.py:297-319 depth metrics, README.md:91-96 fusion protocol). That data
isn't on this box, so the oracle is synthetic-but-exact: textured planar
quads rendered by ray casting (data/synthetic.py GeometricScene) give
photometrically consistent views with closed-form GT depth. Module-level
parity tests can't catch COMPOSITION bugs (intrinsics scaling per stage,
y-flips, half-pixel offsets, resize conventions, bucket plumbing); a full
train -> test.py -> fusion run on this scene can — any such bug destroys
cross-view photoconsistency at the GT depth and craters the end metric.

Scaled-down here (CPU, slow-marked); tools/e2e_protocol.py runs the same
chain at the full DTU protocol (5 views, 1152x1536, 192 depths) on TPU and
commits docs/e2e_protocol_metrics.json.
"""
import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent

H, W = 256, 320  # /64-divisible so eval keeps the native size


def test_renderer_matches_framework_warp():
    """Convention guard (fast): warping a source view into the reference
    frustum AT GT DEPTH through the framework's own homography_warp must
    reproduce the reference image. Catches any drift between the oracle
    renderer's conventions and ops/geometry.py (align_corners pixel centers,
    world->cam extrinsics, K*E composition)."""
    import jax
    import jax.numpy as jnp

    from mvsformerplusplus_tpu.data.synthetic import (GeometricScene,
                                                      geometric_cameras)
    from mvsformerplusplus_tpu.ops.grid_sample import homography_warp

    sc = GeometricScene(0, tex_res=512)
    (k0, e0), (k1, e1) = geometric_cameras(2, H, W)
    img0, d0 = sc.render(k0, e0, H, W)
    img1, _ = sc.render(k1, e1, H, W)

    def proj(k, e):
        p = np.eye(4, dtype=np.float32)
        p[:3, :4] = k @ e[:3, :4]
        return p[None]

    warped, invalid = jax.jit(homography_warp)(
        jnp.asarray(img1[None]), jnp.asarray(proj(k1, e1)),
        jnp.asarray(proj(k0, e0)), jnp.asarray(d0[None, None]))
    ok = ~np.asarray(invalid)[0, 0]
    err = np.abs(np.asarray(warped)[0, 0] - img0)[ok]
    assert ok.mean() > 0.9
    # small residual = resampling blur + occluded slivers; a convention bug
    # (e.g. 1px offset on this texture) lifts mean error by an order
    assert err.mean() < 0.03, err.mean()


@pytest.mark.slow
@pytest.mark.parametrize("model_name", ["casmvs", "flagship"])
def test_e2e_protocol(tmp_path, model_name):
    """Train briefly on the analytic scene, then run the FULL eval pipeline
    (test.py: save_depth -> depth_metric.txt -> all three fusion filters)
    and gate on end metrics vs the analytic GT.

    Both model families go through the gate: CasMVSNet (CNN cascade) and
    the flagship DINOv2MVSNet composition (tiny unfrozen ViT -> SVA
    decoder -> FMT pathway -> CTA stage-1 + 3D PE) — the arch dicts are
    the SAME ones tools/e2e_protocol.py runs at the full DTU protocol on
    TPU."""
    from mvsformerplusplus_tpu.data.synthetic import (GeometricScene,
                                                      make_geometric_dtu,
                                                      make_geometric_eval_scan)
    sys.path.insert(0, str(REPO))
    from tools.e2e_protocol import CASMVS_ARCH, FLAGSHIP_ARCH

    scene = GeometricScene(0, tex_res=1024)
    train_root = tmp_path / "train_data"
    eval_root = tmp_path / "eval_data"
    # train cams: interval sized for the TRAIN hypothesis count (32) so the
    # full scene depth span is inside the sweep (num_depths * interval * 1.06
    # is the range the MS dataset derives, mvs_dataset.py)
    make_geometric_dtu(train_root, n_views=5, n_lights=7, h=H, w=W,
                       ndepth=32, scene=scene)
    make_geometric_eval_scan(eval_root, n_views=5, h=H, w=W, ndepth=48,
                             scene=scene)
    (train_root / "val.txt").write_text("scan1\n")

    arch = {"casmvs": CASMVS_ARCH, "flagship": FLAGSHIP_ARCH}[model_name]
    cfg = {
        "name": f"e2e_oracle_{model_name}",
        "arch": {"args": arch},
        "data_loader": [{
            "type": "DTULoader",
            "args": {
                "datapath": str(train_root),
                "train_data_list": str(train_root / "train.txt"),
                "mode": "train", "nviews": 3, "num_depths": 32,
                "interval_scale": 1.06, "batch_size": 2,
                "val_data_list": str(train_root / "val.txt"),
                "height": 128, "width": 192,
                "random_crop": True, "augment": False, "num_workers": 2,
                "multi_scale_args": {
                    "scales": [[128, 192]],
                    "resize_range": [1.0, 1.0],
                    "scale_batch_map": {"128": 2},
                },
            },
        }],
        # vit_lr = lr: the flagship's tiny ViT trains from scratch here
        "optimizer": {"args": {"lr": 3e-3, "vit_lr": 3e-3,
                               "warmup_steps": 10, "min_lr": 0.05,
                               "weight_decay": 0.01}},
        # flagship: its from-scratch transformer stack (CTA + FMT + SVA +
        # ViT) converges far slower than the CNN baseline — the CPU test
        # trains what a slow test can afford and gates COMPOSITION (well
        # below the untrained regime); the strict quality gates live in
        # the TPU protocol artifact (tools/e2e_protocol.py, 40 epochs)
        "trainer": {"epochs": {"casmvs": 12, "flagship": 12}[model_name],
                    "save_dir": str(tmp_path / "saved"),
                    "logging_every": 20, "monitor": "min mean_error",
                    "early_stop": 100},
    }
    (tmp_path / "cfg.json").write_text(json.dumps(cfg))

    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="",
               PYTHONPATH=str(REPO))
    out = subprocess.run(
        [sys.executable, str(REPO / "train.py"), "-c",
         str(tmp_path / "cfg.json"), "--save_dir", str(tmp_path / "saved")],
        capture_output=True, text=True, env=env, timeout=7200, cwd=str(REPO))
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-3000:])

    (tmp_path / "list.txt").write_text("scan1\n")
    out = subprocess.run(
        [sys.executable, str(REPO / "test.py"),
         "--config", str(tmp_path / "cfg.json"),
         "--ckpt", str(tmp_path / "saved" / "checkpoints"),
         "--testpath", str(eval_root),
         "--testlist", str(tmp_path / "list.txt"),
         "--outdir", str(tmp_path / "out"),
         "--gt_depth_path", str(eval_root / "gt_depths"),
         "--num_view", "5", "--numdepth", "48",
         "--max_h", str(H), "--max_w", str(W),
         "--filter_method", "pcd", "--conf", "0.3", "--fusion_view", "5"],
        capture_output=True, text=True, env=env, timeout=4800, cwd=str(REPO))
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-3000:])

    # -- depth metrics vs analytic GT --------------------------------------
    metrics = {}
    for line in (tmp_path / "out" / "depth_metric.txt").read_text().splitlines():
        if ":" in line:
            k, v = line.split(":", 1)
            try:
                metrics[k.strip()] = float(v.strip().split()[0])
            except ValueError:
                pass
    # scene interval ~= 9mm. Untrained/garbage depth gives abs_depth_error
    # ~100mm and thres20mm ~0.9; casmvs after ~200 CPU steps measured abs
    # ~22mm / thres20 ~0.16 (16-epoch calibration run) — the gates sit
    # between the two regimes with wide margin on both sides, so they
    # catch composition bugs without flaking on training variance. The
    # flagship converges as fast once its CTA starts near-identity
    # (transformer_config init_values=0.01 in FLAGSHIP_ARCH; the TPU
    # oracle hit val mean_error 0.028 by epoch 13) — slightly wider
    # margins cover its extra stochasticity (ViT + SVA + FMT all
    # training from scratch).
    gates = {
        "casmvs": dict(abs=40.0, t20=0.40, t8=0.55, acc_mean=6.0,
                       acc_med=4.0, comp_med=6.0),
        "flagship": dict(abs=45.0, t20=0.45, t8=0.60, acc_mean=7.0,
                         acc_med=5.0, comp_med=8.0),
    }[model_name]
    assert metrics, metrics
    assert metrics["abs_depth_error"] < gates["abs"], metrics
    assert metrics["thres20mm_error"] < gates["t20"], metrics
    assert metrics["thres8mm_error"] < gates["t8"], metrics

    # -- fused cloud vs analytic surface -----------------------------------
    from mvsformerplusplus_tpu.fusion.ply import read_ply

    pts, _ = read_ply(tmp_path / "out" / "scan1.ply")
    assert len(pts) > 10_000, len(pts)
    acc = scene.point_to_surface_distance(np.asarray(pts, np.float32))
    # DTU-style accuracy: distance fused-point -> GT surface. The
    # consistency filter strips depth outliers, so a healthy pipeline lands
    # ~1.4mm mean (calibration run); garbage depth leaves either no points
    # or tens of mm.
    assert float(np.mean(acc)) < gates["acc_mean"], float(np.mean(acc))
    assert float(np.median(acc)) < gates["acc_med"], float(np.median(acc))

    # completeness: GT surface samples (back-projected GT depth of the ref
    # view) must have a fused point nearby
    from scipy.spatial import cKDTree

    from mvsformerplusplus_tpu.data.io import read_cam_file, read_pfm

    gt, _ = read_pfm(eval_root / "gt_depths" / "scan1" / "depth_map_0000.pfm")
    K, E, _, _, _ = read_cam_file(eval_root / "scan1" / "cams" /
                                  "00000000_cam.txt")
    yy, xx = np.mgrid[0:H, 0:W]
    rays = np.linalg.inv(K) @ np.stack(
        [xx.ravel(), yy.ravel(), np.ones(H * W)], 0)
    cam_pts = rays * gt.ravel()[None]
    R, t = E[:3, :3], E[:3, 3]
    world = (R.T @ (cam_pts - t[:, None])).T[::7]  # subsample
    comp = cKDTree(pts).query(world, k=1)[0]
    # median: the mean is dominated by occluded/unfused slivers (calibration
    # run: median 2.2mm, mean 20mm with a long tail)
    assert float(np.median(comp)) < gates["comp_med"], float(np.median(comp))
