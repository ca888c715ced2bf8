"""Synthetic DTU-format scene generator (testing / input-pipeline benching).

Writes the exact on-disk layout the DTU training dataset reads
(reference datasets/dtu_dataset.py wire formats): Cameras/pair.txt +
per-view cam files, Rectified_raw images (7 lights), Depths_raw PFM GT +
visibility masks. Used by the train-CLI e2e test and
tools/bench_input_pipeline.py.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np


def make_synthetic_dtu(root: Path, n_scans: int = 1, n_views: int = 5,
                       n_lights: int = 2, h: int = 256, w: int = 320,
                       seed: int = 0):
    """Mimic the DTU training layout: Cameras/pair.txt + per-view cam files,
    Rectified_raw images, Depths_raw GT. Returns the scan list."""
    from PIL import Image

    from .io import save_cam_file, save_pair_file, save_pfm

    root = Path(root)
    rng = np.random.RandomState(seed)
    (root / "Cameras").mkdir(parents=True)
    pairs = []
    for v in range(n_views):
        ang = 0.01 * v
        c, s = np.cos(ang), np.sin(ang)
        ext = np.eye(4, dtype=np.float32)
        ext[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        ext[0, 3] = 0.02 * v
        intr = np.array([[400.0, 0, w / 2], [0, 400.0, h / 2], [0, 0, 1]],
                        np.float32)
        save_cam_file(root / "Cameras" / f"{v:0>8}_cam.txt", intr, ext,
                      2.5, 0.05)
        pairs.append((v, [(s_, 10.0) for s_ in range(n_views) if s_ != v]))
    save_pair_file(root / "Cameras" / "pair.txt", pairs)

    scans = [f"scan{i + 1}" for i in range(n_scans)]
    for scan in scans:
        (root / "Rectified_raw" / scan).mkdir(parents=True)
        (root / "Depths_raw" / scan).mkdir(parents=True)
        for v in range(n_views):
            for light in range(n_lights):
                img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
                Image.fromarray(img).save(
                    root / "Rectified_raw" / scan
                    / f"rect_{v + 1:0>3}_{light}_r5000.png")
            depth = rng.uniform(3.0, 7.0, (h, w)).astype(np.float32)
            save_pfm(root / "Depths_raw" / scan / f"depth_map_{v:0>4}.pfm",
                     depth)
            mask = (rng.rand(h, w) > 0.2).astype(np.uint8) * 255
            Image.fromarray(mask).save(
                root / "Depths_raw" / scan / f"depth_visual_{v:0>4}.png")
    (root / "train.txt").write_text("\n".join(scans) + "\n")
    return scans
