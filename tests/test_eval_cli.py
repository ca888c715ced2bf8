"""End-to-end eval CLI smoke: synthetic MVSNet-format scan on disk ->
test.py save_depth + dpcd fusion -> PFM depths + PLY point cloud."""
import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


def make_synthetic_scan(root: Path, scan="scan1", n_views=4, h=128, w=192):
    """MVSNet-format scan: images/, cams/, pair.txt."""
    from mvsformerplusplus_tpu.data.io import save_cam_file, save_pair_file

    sd = root / scan
    (sd / "images").mkdir(parents=True)
    (sd / "cams").mkdir(parents=True)
    rng = np.random.RandomState(0)
    from PIL import Image

    for v in range(n_views):
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(sd / "images" / f"{v:0>8}.jpg")
        ang = 0.01 * v
        c, s = np.cos(ang), np.sin(ang)
        ext = np.eye(4, dtype=np.float32)
        ext[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        ext[0, 3] = 0.05 * v
        intr = np.array([[150.0, 0, w / 2], [0, 150.0, h / 2], [0, 0, 1]], np.float32)
        save_cam_file(sd / "cams" / f"{v:0>8}_cam.txt", intr, ext, 2.5, 0.05)
    pairs = [(r, [(s, 10.0) for s in range(n_views) if s != r]) for r in range(n_views)]
    save_pair_file(sd / "pair.txt", pairs)
    return scan


@pytest.mark.slow
def test_eval_cli_end_to_end(tmp_path):
    scan = make_synthetic_scan(tmp_path / "data")
    (tmp_path / "list.txt").write_text(f"{scan}\n")

    # minimal casmvs config (CNN-only keeps the CPU compile quick)
    cfg = {
        "arch": {"args": {
            "model_type": "casmvs",
            "feat_chs": [4, 8, 16, 32],
            "base_ch": [4, 4, 4, 4],
            "ndepths": [8, 4, 4, 4],
            "depth_interals_ratio": [4.0, 2.67, 1.5, 1.0],
            "depth_type": ["ce", "ce", "ce", "ce"],
            "inverse_depth": True,
            "cost_reg_type": ["Normal", "Normal", "Normal", "Normal"],
        }},
    }
    (tmp_path / "cfg.json").write_text(json.dumps(cfg))

    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="",
               PYTHONPATH=str(REPO))
    out = subprocess.run(
        [sys.executable, str(REPO / "test.py"),
         "--config", str(tmp_path / "cfg.json"),
         "--testpath", str(tmp_path / "data"),
         "--testlist", str(tmp_path / "list.txt"),
         "--outdir", str(tmp_path / "out"),
         "--num_view", "3", "--numdepth", "32",
         "--max_h", "128", "--max_w", "192",
         "--filter_method", "dpcd", "--conf", "0.0",
         "--fusion_view", "3"],
        capture_output=True, text=True, env=env, timeout=540, cwd=str(REPO),
    )
    assert out.returncode == 0, out.stderr[-3000:]

    from mvsformerplusplus_tpu.data.io import read_pfm
    from mvsformerplusplus_tpu.fusion.ply import read_ply

    d, _ = read_pfm(tmp_path / "out" / scan / "depth_est" / "00000000.pfm")
    assert d.shape == (128, 192)
    assert np.isfinite(d).all()
    conf = np.load(tmp_path / "out" / scan / "confidence" / "00000000.npy")
    assert conf.dtype == np.uint8

    ply = tmp_path / "out" / f"{scan}.ply"
    assert ply.exists()
    pts, cols = read_ply(ply)
    assert pts.ndim == 2 and pts.shape[1] == 3
    assert cols is not None

    # queue mode (work-stealing scheduler): same scan, gipuma fusion; a
    # second queue worker run finds everything claimed and does nothing
    out = subprocess.run(
        [sys.executable, str(REPO / "test.py"),
         "--config", str(tmp_path / "cfg.json"),
         "--testpath", str(tmp_path / "data"),
         "--testlist", str(tmp_path / "list.txt"),
         "--outdir", str(tmp_path / "out_q"),
         "--num_view", "3", "--numdepth", "32",
         "--max_h", "128", "--max_w", "192",
         "--schedule", "queue",
         "--filter_method", "gipuma", "--prob_threshold", "0.0",
         "--disp_threshold", "1.0", "--num_consistent", "1",
         "--fusion_view", "3"],
        capture_output=True, text=True, env=env, timeout=540, cwd=str(REPO),
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert (tmp_path / "out_q" / ".claims" / f"{scan}.done").exists()
    assert (tmp_path / "out_q" / f"{scan}.ply").exists()

    from mvsformerplusplus_tpu.parallel.scheduler import WorkQueue

    assert WorkQueue(tmp_path / "out_q", [scan]).pending() == []


def test_validate_warp_windows_tool(tmp_path):
    """Pre-flight geometry validator (tools/validate_warp_windows.py) runs
    the shipped escape diagnostics over a real on-disk scan and exits 0 on
    sound geometry."""
    import subprocess
    import sys as _sys

    scan = make_synthetic_scan(tmp_path / "data")
    r = subprocess.run(
        [_sys.executable, "tools/validate_warp_windows.py",
         "--data", str(tmp_path / "data" / scan), "--num_views", "4",
         "--ndepth", "48", "--resolution", "128x192",
         "--native", "128x192", "--samples", "2"],
        capture_output=True, text=True,
        cwd=str(Path(__file__).resolve().parent.parent),
        env={**os.environ, "JAX_PLATFORMS": "cpu",
             "PALLAS_AXON_POOL_IPS": ""})
    assert r.returncode == 0, r.stdout + r.stderr
    assert "OK" in r.stdout
