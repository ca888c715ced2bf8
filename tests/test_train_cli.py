"""End-to-end train CLI smoke: synthetic DTU-format training data on disk ->
train.py runs an epoch of steps and writes checkpoints."""
import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


from mvsformerplusplus_tpu.data.synthetic import make_synthetic_dtu


@pytest.mark.slow
def test_train_cli_end_to_end(tmp_path, monkeypatch):
    # DTU layout expects 7 lights; generate all 7 (small images keep it fast)
    data = tmp_path / "dtu"
    make_synthetic_dtu(data, n_lights=7)
    # validation list (same synthetic scan): exercises the val-loader branch,
    # monitor metrics, and best-checkpoint selection
    (data / "val.txt").write_text("scan1\n")

    cfg = {
        "name": "smoke",
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
        "data_loader": [{
            "type": "DTULoader",
            "args": {
                "datapath": str(data),
                "train_data_list": str(data / "train.txt"),
                "mode": "train",
                "nviews": 3,
                "num_depths": 32,
                "interval_scale": 1.06,
                "batch_size": 2,
                "val_data_list": str(data / "val.txt"),
                "height": 128,
                "width": 192,
                "random_crop": True,
                "augment": True,
                "num_workers": 2,
                "multi_scale_args": {
                    "scales": [[128, 192]],
                    "resize_range": [1.0, 1.1],
                    "scale_batch_map": {"128": 2},
                },
            },
        }],
        "optimizer": {"args": {"lr": 1e-3, "warmup_steps": 2, "min_lr": 0.01,
                               "weight_decay": 0.01}},
        "trainer": {"epochs": 1, "save_dir": str(tmp_path / "saved"),
                    "logging_every": 1, "monitor": "min mean_error",
                    "early_stop": 10},
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))

    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="",
               PYTHONPATH=str(REPO))
    out = subprocess.run(
        [sys.executable, str(REPO / "train.py"), "-c", str(cfg_path),
         "--debug", "--save_dir", str(tmp_path / "saved")],
        capture_output=True, text=True, env=env, timeout=900, cwd=str(REPO))
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-3000:])
    # image panels written at logging_every (reference utils.py:103-123):
    # train panels from the step logs + one val panel per validation
    pngs = list((tmp_path / "saved" / "images").glob("*.png"))
    assert any(p.name.startswith("train_") for p in pngs), pngs
    assert any(p.name.startswith("val_") for p in pngs), pngs
    # --debug: per-module grad norms logged (reference trainer:151-168)
    assert "per-module gnorm" in (out.stderr + out.stdout)
    # checkpoints written
    ckpt_dir = tmp_path / "saved" / "checkpoints"
    assert (ckpt_dir / "meta.json").exists(), list((tmp_path / "saved").rglob("*"))
    meta = json.loads((ckpt_dir / "meta.json").read_text())
    assert meta["last_epoch"] == 0
    # loss logged and finite
    assert "loss" in out.stderr or "loss" in out.stdout
    # validation ran: monitor metric logged + best checkpoint flagged
    logtxt = out.stderr + out.stdout
    assert "mean_error" in logtxt, logtxt[-3000:]
    assert (ckpt_dir / "best.json").exists()
    best = json.loads((ckpt_dir / "best.json").read_text())
    assert np.isfinite(best["monitor_best"])

    # finetune with reset_sche=false: optimizer state restored and the LR
    # schedule continued at the checkpoint's step (reference train.py:163-167
    # scheduler fast-forward semantics)
    cfg["arch"]["reset_sche"] = False
    cfg["arch"]["dtu_model_path"] = str(ckpt_dir)
    ft_path = tmp_path / "cfg_ft.json"
    ft_path.write_text(json.dumps(cfg))
    out = subprocess.run(
        [sys.executable, str(REPO / "train.py"), "-c", str(ft_path),
         "--finetune", "--save_dir", str(tmp_path / "saved_ft")],
        capture_output=True, text=True, env=env, timeout=900, cwd=str(REPO))
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-3000:])
    logtxt = out.stderr + out.stdout
    m = [l for l in logtxt.splitlines() if "schedule continued at step" in l]
    assert m, logtxt[-3000:]
    assert int(m[0].rsplit("step", 1)[1].strip()) > 0, m[0]
