"""Full DTU-protocol end-to-end accuracy run on the analytic oracle scene.

    python tools/e2e_protocol.py [--root /tmp/e2e_protocol] [--epochs 8]
        [--models casmvs,flagship]

The scaled-down CPU version lives in tests/test_e2e_protocol.py; this tool
runs the SAME chain at the reference's DTU eval protocol (5 views,
1152x1536, 192 depth hypotheses — README.md:91-96) on the TPU, for BOTH
model families:

  - casmvs: the CNN-only cascade baseline (reference
    models/networks/casmvs_model.py);
  - flagship: the full DINOv2MVSNet composition — 0.4375 ViT rescale ->
    SVA cross-view decoder -> FMT + pathway -> CTA stage-1 regularizer
    with 3D PE (reference models/networks/DINOv2_mvsformer_model.py) —
    with a TINY from-scratch ViT (vit_ch=48, depth 3, unfrozen) because
    the pretrained dinov2_vitb14 weights do not exist on this box. Every
    subsystem that defines MVSFormer++ is on; only the backbone capacity
    is scaled down.

Per model: 1. render the analytic quad scene (exact GT depth) as a
DTU-format train set (512x640 bucket) and an MVSNet-format eval scan at
protocol resolution; 2. train on it; 3. run test.py at the full protocol
-> depth_metric.txt vs analytic GT; 4. fuse with all three filters
(pcd / dpcd / gipuma) and score each cloud against the analytic surface
(accuracy) and the back-projected GT (completeness); 5. write
docs/e2e_protocol_metrics.json plus the per-round trend copy
docs/e2e_protocol_metrics_r{N}.json (--round) so kernel rounds cannot
silently regress end accuracy (reference per-epoch val gate,
trainer/mvsformer_trainer.py:256-354).

A composition bug anywhere (per-stage intrinsics, resize, warp
conventions, bucket plumbing, fusion math) craters these end metrics;
module-level parity tests cannot catch the composition.
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np

H, W = 1152, 1536
TRAIN_H, TRAIN_W = 512, 640

CASMVS_ARCH = {
    "model_type": "casmvs",
    "feat_chs": [8, 16, 32, 64], "base_ch": [8, 8, 8, 8],
    "ndepths": [32, 16, 8, 4],
    "depth_interals_ratio": [4.0, 2.67, 1.5, 1.0],
    "depth_type": ["ce", "ce", "ce", "ce"],
    "inverse_depth": True,
    "cost_reg_type": ["Normal", "Normal", "Normal", "Normal"],
}

# The production flagship args (configs/mvsformerplusplus.json) with ONLY
# the ViT scaled down (48ch x 3 blocks, unfrozen, random init) — SVA
# decoder, FMT + pathway, CTA + 3D PE all at production shapes.
FLAGSHIP_ARCH = {
    "model_type": "DINOv2-tiny",
    "feat_chs": [8, 16, 32, 64], "base_ch": [8, 8, 8, 8],
    "ndepths": [32, 16, 8, 4],
    "depth_interals_ratio": [4.0, 2.67, 1.5, 1.0],
    "depth_type": ["ce", "ce", "ce", "ce"],
    "inverse_depth": True,
    "cost_reg_type": ["PureTransformerCostReg", "Normal", "Normal", "Normal"],
    "use_pe3d": True,
    "rescale": 0.4375,
    "freeze_vit": False,
    "vit_ch": 48, "vit_depth": 3, "vit_num_heads": 2, "out_ch": 64,
    "dino_cfg": {
        "cross_interval_layers": 3,
        "decoder_cfg": {
            "attention_type": "Linear", "d_model": 48, "nhead": 2,
            "ffn_type": "ffn", "init_values": 1.0, "prev_values": 0.5,
            "post_norm": False, "pre_norm_query": True,
            "no_combine_norm": False,
            "softmax_scale": "entropy_invariance", "train_avg_length": 762,
        },
    },
    "FMT_config": {
        "attention_type": "Linear", "base_channel": 8, "d_model": 64,
        "ffn_type": "ffn", "init_values": 1.0,
        "layer_names": ["self", "cross", "self", "cross"], "nhead": 4,
        "post_norm": False, "pre_norm_query": False,
        "softmax_scale": "entropy_invariance", "train_avg_length": 12185,
    },
    "transformer_config": [{
        "base_channel": 8, "down_rate": [2, 4, 4], "layer_num": 6,
        "mid_channel": 64, "mlp_ratio": 4, "num_heads": 4,
        "position_encoding": True, "softmax_scale": "entropy_invariance",
        "train_avg_length": 12185, "use_pe_proj": True,
        # FROM-SCRATCH regime: near-zero residual gammas keep the 6-layer
        # post-norm CTA near-identity at init so the correlation signal
        # reaches the prob head immediately (reference-exposed knob,
        # models/module.py:562; default-init measured at chance-level
        # stage-1 CE after 700 oracle steps while the raw volume argmax
        # was already at 11.6 mm median — the reference never faces this
        # because its ViT is pretrained and it trains 25k steps)
        "init_values": 0.01,
    }],
}


def build_data(root: Path):
    from mvsformerplusplus_tpu.data.synthetic import (GeometricScene,
                                                      make_geometric_dtu,
                                                      make_geometric_eval_scan)

    scene = GeometricScene(0, tex_res=4096)
    tr, ev = root / "train_data", root / "eval_data"
    if not (tr / "train.txt").exists():
        # Train renders at the PROTOCOL resolution, crops taken by the MS
        # dataset — matching the reference, whose DTU-MS crops come from
        # native 1200x1600 images (datasets/dtu_dataset_ms.py:289-318).
        # Rendering the train set at crop size instead (the r5a version)
        # trained every view at ~0.5x the eval pixel density and the
        # from-scratch flagship backbone did not generalize to protocol
        # scale (docs/e2e_protocol_metrics_r05.json fullres_attempt).
        print(f"rendering train set ({H}x{W})...", flush=True)
        make_geometric_dtu(tr, n_views=5, n_lights=7, h=H, w=W,
                           ndepth=32, scene=scene)
        (tr / "val.txt").write_text("scan1\n")
        print("rendering eval scan (1152x1536)...", flush=True)
        make_geometric_eval_scan(ev, n_views=5, h=H, w=W, ndepth=192,
                                 scene=scene)
    return scene, tr, ev


def cloud_metrics(scene, ply_path: Path, eval_root: Path):
    from scipy.spatial import cKDTree

    from mvsformerplusplus_tpu.data.io import read_cam_file, read_pfm
    from mvsformerplusplus_tpu.fusion.ply import read_ply

    pts, _ = read_ply(ply_path)
    pts = np.asarray(pts, np.float32)
    acc = scene.point_to_surface_distance(pts)
    gt, _ = read_pfm(eval_root / "gt_depths" / "scan1" / "depth_map_0000.pfm")
    K, E, _, _, _ = read_cam_file(
        eval_root / "scan1" / "cams" / "00000000_cam.txt")
    h, w = gt.shape
    yy, xx = np.mgrid[0:h, 0:w]
    rays = np.linalg.inv(K) @ np.stack(
        [xx.ravel(), yy.ravel(), np.ones(h * w)], 0)
    cam_pts = rays * gt.ravel()[None]
    world = (E[:3, :3].T @ (cam_pts - E[:3, 3][:, None])).T[::29]
    comp = cKDTree(pts).query(world, k=1)[0]
    return {
        "n_points": int(len(pts)),
        "accuracy_mean_mm": round(float(np.mean(acc)), 4),
        "accuracy_median_mm": round(float(np.median(acc)), 4),
        "completeness_mean_mm": round(float(np.mean(comp)), 4),
        "completeness_median_mm": round(float(np.median(comp)), 4),
    }


def run_model(name: str, arch: dict, root: Path, scene, tr: Path, ev: Path,
              epochs: int, skip_train: bool, env: dict) -> dict:
    mroot = root / name
    mroot.mkdir(parents=True, exist_ok=True)
    cfg = {
        "name": f"e2e_protocol_{name}",
        "arch": {"args": arch},
        "data_loader": [{"type": "DTULoader", "args": {
            "datapath": str(tr), "train_data_list": str(tr / "train.txt"),
            "mode": "train", "nviews": 5, "num_depths": 32,
            "interval_scale": 1.06, "batch_size": 2,
            "val_data_list": str(tr / "val.txt"),
            "height": TRAIN_H, "width": TRAIN_W,
            "random_crop": True, "augment": False, "num_workers": 4,
            # Three crop buckets spanning ~0.45x..~1.07x of protocol pixel
            # density (the reference's 25-bucket spread compressed to its
            # endpoints+midpoint; scale_batch_map per reference
            # config/mvsformer++.json:159-169) — the density spread is what
            # teaches the from-scratch backbone protocol-scale features.
            "multi_scale_args": {"scales": [[TRAIN_H, TRAIN_W],
                                            [768, 960], [1024, 1280]],
                                 "resize_range": [1.0, 1.2],
                                 "scale_batch_map": {str(TRAIN_H): 2,
                                                     "768": 1, "1024": 1}},
        }}],
        # vit_lr: the oracle's tiny ViT trains FROM SCRATCH (no pretrained
        # weights exist here), so it gets the same lr as the rest
        "optimizer": {"args": {"lr": 3e-3, "vit_lr": 3e-3,
                               "warmup_steps": 20,
                               "min_lr": 0.05, "weight_decay": 0.01}},
        "trainer": {"epochs": epochs, "save_dir": str(mroot / "saved"),
                    "logging_every": 10, "monitor": "min mean_error",
                    "early_stop": 100,
                    # 1024x1280 misses one v5e's HBM by 242M at B=1 under
                    # cost_reg remat at PRODUCTION backbone scale
                    # (docs/bucket_table.md); the oracle's tiny ViT is
                    # smaller but the margin is thin — route the largest
                    # bucket through stage-granularity remat
                    "remat_map": {"1024": "stage"}},
    }
    (mroot / "cfg.json").write_text(json.dumps(cfg))

    t0 = time.time()
    if not skip_train:
        r = subprocess.run(
            [sys.executable, str(REPO / "train.py"), "-c",
             str(mroot / "cfg.json"), "--save_dir", str(mroot / "saved")],
            env=env, cwd=str(REPO))
        assert r.returncode == 0, f"training failed ({name})"
    train_s = time.time() - t0

    (root / "list.txt").write_text("scan1\n")
    results = {"train_epochs": epochs, "train_seconds": round(train_s, 1)}
    filters = [
        ("pcd", ["--filter_method", "pcd", "--conf", "0.3",
                 "--fusion_view", "5"]),
        ("dpcd", ["--filter_method", "dpcd", "--conf", "0.3",
                  "--fusion_view", "5"]),
        ("gipuma", ["--filter_method", "gipuma", "--prob_threshold", "0.3",
                    "--disp_threshold", "1.0", "--num_consistent", "2",
                    "--fusion_view", "5"]),
    ]
    # One shared outdir: depth inference (the expensive TPU leg) runs once
    # for the first filter; the rest fuse the same maps via --skip_depth.
    out = mroot / "out"
    for i, (fname, extra) in enumerate(filters):
        t0 = time.time()
        r = subprocess.run(
            [sys.executable, str(REPO / "test.py"),
             "--config", str(mroot / "cfg.json"),
             "--ckpt", str(mroot / "saved" / "checkpoints"),
             "--testpath", str(ev), "--testlist", str(root / "list.txt"),
             "--outdir", str(out), "--gt_depth_path", str(ev / "gt_depths"),
             "--num_view", "5", "--numdepth", "192",
             "--max_h", str(H), "--max_w", str(W)] + extra
            + (["--skip_depth"] if i else []),
            env=env, cwd=str(REPO))
        assert r.returncode == 0, f"test.py failed ({name}/{fname})"
        entry = {"eval_seconds": round(time.time() - t0, 1)}
        metric_txt = out / "depth_metric.txt"
        if metric_txt.exists():
            for line in metric_txt.read_text().splitlines():
                if ":" in line:
                    k, v = line.split(":", 1)
                    try:
                        entry[k.strip()] = round(float(v.split()[0]), 6)
                    except ValueError:
                        pass
        entry.update(cloud_metrics(scene, out / "scan1.ply", ev))
        results[fname] = entry
        print(name, fname, json.dumps(entry), flush=True)
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/e2e_protocol")
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--flagship-epochs", type=int, default=40,
                    help="flagship epochs (its from-scratch transformer "
                         "stack — CTA + FMT + SVA + ViT — converges far "
                         "slower than the CNN baseline; the r5 run showed "
                         "its CE loss still dropping at epoch 12)")
    ap.add_argument("--models", default="casmvs,flagship")
    ap.add_argument("--round", type=int, default=0,
                    help="also write docs/e2e_protocol_metrics_r{N}.json")
    ap.add_argument("--skip-train", action="store_true",
                    help="reuse checkpoints from a previous run")
    args = ap.parse_args()

    root = Path(args.root)
    root.mkdir(parents=True, exist_ok=True)
    scene, tr, ev = build_data(root)

    # APPEND to PYTHONPATH: replacing it drops the axon sitecustomize dir
    # that registers the TPU-relay plugin ("Backend 'axon' is not known")
    env = dict(os.environ, PYTHONPATH=os.pathsep.join(
        [str(REPO), os.environ.get("PYTHONPATH", "")]))

    archs = {"casmvs": (CASMVS_ARCH, args.epochs),
             "flagship": (FLAGSHIP_ARCH,
                          args.flagship_epochs or args.epochs)}
    results = {"protocol": f"5 views, {H}x{W}, 192 depths, bf16 TPU",
               "note": "both models trained from scratch on the analytic "
                       "scene (pretrained reference weights are not "
                       "available on this box); flagship = full "
                       "DINOv2MVSNet composition with a tiny unfrozen ViT "
                       "(48ch x 3 blocks)"}
    for name in args.models.split(","):
        arch, ep = archs[name]
        results[name] = run_model(name, arch, root, scene, tr, ev, ep,
                                  args.skip_train, env)

    art = REPO / "docs" / "e2e_protocol_metrics.json"
    # merge with an existing artifact so running one model doesn't drop
    # the other's committed section
    if art.exists():
        try:
            prev = json.loads(art.read_text())
            for k, v in prev.items():
                results.setdefault(k, v)
        except (json.JSONDecodeError, AttributeError):
            pass
    art.write_text(json.dumps(results, indent=2) + "\n")
    print("wrote", art, flush=True)
    if args.round:
        rart = REPO / "docs" / f"e2e_protocol_metrics_r{args.round:02d}.json"
        rart.write_text(json.dumps(results, indent=2) + "\n")
        print("wrote", rart, flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
