"""Warp-window pre-flight enforcement (ops/window_check.py).

The production warp's shared-window plans (banded bands, folded patches)
are escape-pinned on DTU geometry only; any other camera class must be
validated or the warp silently zeroes samples/gradients (the reference
warp is unconditionally exact — reference models/warping.py:69-109).
These tests pin: (a) benign geometry passes; (b) adversarial strong-tilt
cams are FLAGGED and fall back to the exact warp; (c) the eval CLI applies
the fallback end-to-end and still produces finite depth; (d) the trainer's
--debug mode fails loudly.
"""
import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def make_cams(b, v, h, w, roll=0.0, yaw_step=0.1, tx=0.3):
    """Per-stage camera stacks; roll > 0 tilts epipolar lines (the class
    that breaks shared row-band windows)."""
    cams = {}
    for s in range(4):
        scale = 0.125 * 2 ** s
        cam = np.zeros((b, v, 2, 4, 4), np.float32)
        for vi in range(v):
            ang = yaw_step * vi
            c, sn = np.cos(ang), np.sin(ang)
            ext = np.eye(4, dtype=np.float32)
            ry = np.array([[c, 0, sn], [0, 1, 0], [-sn, 0, c]], np.float32)
            r = roll * vi
            cr, sr = np.cos(r), np.sin(r)
            rz = np.array([[cr, -sr, 0], [sr, cr, 0], [0, 0, 1]], np.float32)
            ext[:3, :3] = rz @ ry
            ext[0, 3] = tx * vi
            cam[:, vi, 0] = ext
            f = 60.0 * scale / 0.125
            cam[:, vi, 1, :3, :3] = np.array(
                [[f, 0, w * scale / 2], [0, f, h * scale / 2], [0, 0, 1]],
                np.float32)
        cams[f"stage{s + 1}"] = cam
    return cams


DV = np.linspace(2.5, 8.0, 48, dtype=np.float32)[None]


def test_benign_geometry_passes():
    from mvsformerplusplus_tpu.models.casmvs import CasMVSNet
    from mvsformerplusplus_tpu.ops.window_check import (fallback_warp_modes,
                                                        scan_window_report)

    m = CasMVSNet(warp_mode="banded")
    reps = scan_window_report(m, make_cams(1, 4, 128, 256), DV, 128, 256,
                              train=True)
    assert all(r.ok for r in reps), [str(r) for r in reps]
    _, banded_bwd, changed = fallback_warp_modes(m, reps)
    assert not changed and banded_bwd


def test_adversarial_tilt_flags_and_falls_back():
    from mvsformerplusplus_tpu.models.casmvs import CasMVSNet
    from mvsformerplusplus_tpu.ops.window_check import (fallback_warp_modes,
                                                        scan_window_report)

    m = CasMVSNet(warp_mode="banded")
    reps = scan_window_report(m, make_cams(1, 4, 128, 256, roll=0.6), DV,
                              128, 256, train=True)
    banded = [r for r in reps if r.mode == "banded"]
    assert banded, "expected banded stages at this shape"
    assert any(not r.ok for r in banded), [str(r) for r in reps]
    modes, banded_bwd, changed = fallback_warp_modes(m, reps)
    assert changed
    for r, mode in zip(reps, modes):
        if not r.ok:
            assert mode == "folded"
    # a failing banded BACKWARD window also disables the banded transpose
    # for the folded path's image gradient
    assert not banded_bwd


def test_row_group_stride_estimates_match():
    """Subsampled escape estimates stay exact per evaluated group — on a
    geometry with uniform tilt the strided estimate must be close to the
    full one (and identically zero for the benign case)."""
    from mvsformerplusplus_tpu.ops.grid_sample import banded_escape_fraction
    from mvsformerplusplus_tpu.ops.geometry import (compose_projection,
                                                    plane_sweep_coords)
    import jax.numpy as jnp

    cams = make_cams(1, 2, 128, 256, roll=0.5)["stage4"]
    proj = compose_projection(jnp.asarray(cams))
    coords, _ = plane_sweep_coords(proj[:, 1], proj[:, 0],
                                   jnp.asarray(DV[:, :4]), 128, 256)
    coords = np.asarray(coords)
    full = banded_escape_fraction(coords, 128, 256, gy=8, ky=24)
    strided = banded_escape_fraction(coords, 128, 256, gy=8, ky=24,
                                     row_group_stride=4, d_stride=2)
    assert abs(full - strided) < 0.08, (full, strided)
    assert (full > 0.01) == (strided > 0.01)


@pytest.mark.slow
def test_eval_cli_fallback_end_to_end(tmp_path):
    """test.py with adversarial cams: the per-scan window check must
    trigger, fall back the offending stages, and still produce finite
    depth (VERDICT r4 #5)."""
    from mvsformerplusplus_tpu.data.io import save_cam_file, save_pair_file
    from PIL import Image

    h, w = 128, 256
    n_views = 4
    sd = tmp_path / "data" / "scan1"
    (sd / "images").mkdir(parents=True)
    (sd / "cams").mkdir(parents=True)
    rng = np.random.RandomState(0)
    cams = make_cams(1, n_views, h, w, roll=0.6)["stage4"][0]
    for v in range(n_views):
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(sd / "images" / f"{v:0>8}.jpg")
        save_cam_file(sd / "cams" / f"{v:0>8}_cam.txt",
                      cams[v, 1, :3, :3], cams[v, 0], 2.5, 0.12)
    save_pair_file(sd / "pair.txt",
                   [(r, [(s, 10.0) for s in range(n_views) if s != r])
                    for r in range(n_views)])
    (tmp_path / "list.txt").write_text("scan1\n")

    cfg = {"arch": {"args": {
        "model_type": "casmvs",
        "feat_chs": [4, 8, 16, 32], "base_ch": [4, 4, 4, 4],
        "ndepths": [8, 4, 4, 4],
        "depth_interals_ratio": [4.0, 2.67, 1.5, 1.0],
        "depth_type": ["ce", "ce", "ce", "ce"],
        "inverse_depth": True,
        "cost_reg_type": ["Normal", "Normal", "Normal", "Normal"],
        # force the banded plans so the check has something to flag even
        # on the CPU backend (where 'auto' resolves to the exact warp)
        "warp_mode": "banded",
    }}}
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
         "--max_h", str(h), "--max_w", str(w),
         "--filter_method", "none"],
        capture_output=True, text=True, env=env, timeout=900,
        cwd=str(REPO))
    assert out.returncode == 0, out.stderr[-3000:]
    assert "falling back" in out.stderr + out.stdout, out.stderr[-2000:]

    from mvsformerplusplus_tpu.data.io import read_pfm

    d, _ = read_pfm(tmp_path / "out" / "scan1" / "depth_est" / "00000000.pfm")
    assert d.shape == (h, w) and np.isfinite(d).all()


def test_trainer_debug_raises_on_escapes():
    from mvsformerplusplus_tpu.models.casmvs import CasMVSNet
    from mvsformerplusplus_tpu.train.trainer import Trainer

    h, w = 128, 256
    m = CasMVSNet(warp_mode="banded",
                  feat_chs=(4, 8, 16, 32), ndepths=(8, 4, 4, 4))
    t = Trainer.__new__(Trainer)  # only the window check is exercised
    t.model = m
    t.debug = True
    t._window_checked = set()
    batch = {
        "imgs": np.zeros((1, 3, h, w, 3), np.float32),
        "cams": make_cams(1, 3, h, w, roll=0.6),
        "depth_values": DV,
    }
    with pytest.raises(ValueError, match="ESCAPE"):
        t._debug_window_check(batch)
    # benign cams pass
    t2 = Trainer.__new__(Trainer)
    t2.model = m
    t2.debug = True
    t2._window_checked = set()
    batch["cams"] = make_cams(1, 3, h, w)
    t2._debug_window_check(batch)
