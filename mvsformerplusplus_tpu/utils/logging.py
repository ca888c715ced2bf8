"""Run logging: console + rotating file + scalar/image sinks.

Re-design of the reference's logging stack (logger/logger.py,
logger/logger_config.json, utils.py:87-123 tensorboardX writers): python
logging with a rotating info.log, plus a dependency-free JSONL scalar sink
(readable by any dashboard) and optional tensorboardX if present.
"""
from __future__ import annotations

import json
import logging
import logging.handlers
import time
from pathlib import Path
from typing import Dict, Optional

import numpy as np


def setup_logging(save_dir, verbosity: int = 2) -> logging.Logger:
    """Console + rotating file (reference logger/logger_config.json)."""
    save_dir = Path(save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)
    level = {0: logging.WARNING, 1: logging.INFO, 2: logging.INFO}.get(verbosity, logging.DEBUG)
    logger = logging.getLogger("mvsformerplusplus_tpu")
    logger.setLevel(level)
    logger.handlers.clear()
    con = logging.StreamHandler()
    con.setFormatter(logging.Formatter("%(message)s"))
    logger.addHandler(con)
    fh = logging.handlers.RotatingFileHandler(
        save_dir / "info.log", maxBytes=10 * 1024 * 1024, backupCount=5)
    fh.setFormatter(logging.Formatter(
        "%(asctime)s - %(name)s - %(levelname)s - %(message)s"))
    logger.addHandler(fh)
    return logger


class ScalarWriter:
    """JSONL scalar sink + optional tensorboardX mirror
    (≡ reference save_scalars, utils.py:87-101)."""

    def __init__(self, save_dir, use_tensorboard: bool = False):
        self.path = Path(save_dir) / "scalars.jsonl"
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._fh = open(self.path, "a")
        self.tb = None
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter

                self.tb = SummaryWriter(str(Path(save_dir) / "tb"))
            except ImportError:
                pass

    def write(self, mode: str, scalars: Dict[str, float], step: int):
        rec = {"time": time.time(), "mode": mode, "step": int(step)}
        rec.update({k: float(v) for k, v in scalars.items()})
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()
        if self.tb is not None:
            for k, v in scalars.items():
                self.tb.add_scalar(f"{mode}/{k}", float(v), step)

    def close(self):
        self._fh.close()
        if self.tb is not None:
            self.tb.close()


def _colorize(x: np.ndarray, lo: float = None, hi: float = None,
              mask: Optional[np.ndarray] = None) -> np.ndarray:
    """[H, W] float -> uint8 [H, W, 3] with a blue->green->red ramp.
    Robust range from 2/98 percentiles of the (masked) values."""
    x = np.asarray(x, np.float32)
    finite = np.isfinite(x)
    sel = finite if mask is None else (finite & (mask > 0.5))
    vals = x[sel]
    if vals.size == 0:
        return np.zeros((*x.shape, 3), np.uint8)
    lo = float(np.percentile(vals, 2)) if lo is None else lo
    hi = float(np.percentile(vals, 98)) if hi is None else hi
    t = np.clip((np.where(finite, x, lo) - lo) / max(hi - lo, 1e-9), 0, 1)
    r = np.clip(1.5 - np.abs(4 * t - 3), 0, 1)
    g = np.clip(1.5 - np.abs(4 * t - 2), 0, 1)
    b = np.clip(1.5 - np.abs(4 * t - 1), 0, 1)
    img = np.stack([r, g, b], -1)
    if mask is not None:
        img = img * (mask > 0.5)[..., None]
    return (img * 255).astype(np.uint8)


class ImageWriter:
    """Depth/confidence/GT/error image panels (≡ reference save_images,
    utils.py:103-123, emitted every logging_every steps,
    trainer/mvsformer_trainer.py:221-235). Writes PNG grids under
    save_dir/images/ (dependency-free) and mirrors to tensorboardX when a
    SummaryWriter is supplied."""

    def __init__(self, save_dir, tb=None):
        self.dir = Path(save_dir) / "images"
        self.dir.mkdir(parents=True, exist_ok=True)
        self.tb = tb

    def write(self, mode: str, step: int, depth_est: np.ndarray,
              depth_gt: Optional[np.ndarray] = None,
              confidence: Optional[np.ndarray] = None,
              mask: Optional[np.ndarray] = None):
        """All inputs [H, W] (first sample of the batch, host numpy)."""
        from PIL import Image

        depth_est = np.asarray(depth_est, np.float32)
        panels = []
        m = None if mask is None else np.asarray(mask, np.float32)
        if depth_gt is not None:
            gt = np.asarray(depth_gt, np.float32)
            sel = gt > 0 if m is None else (m > 0.5)
            lo = float(np.percentile(gt[sel], 2)) if sel.any() else None
            hi = float(np.percentile(gt[sel], 98)) if sel.any() else None
            panels.append(("depth_gt", _colorize(gt, lo, hi, m)))
            panels.append(("depth_est", _colorize(depth_est, lo, hi)))
            err = np.abs(depth_est - gt)
            panels.append(("abs_error", _colorize(err, 0.0, None, m)))
        else:
            panels.append(("depth_est", _colorize(depth_est)))
        if confidence is not None:
            panels.append(("confidence", _colorize(
                np.asarray(confidence, np.float32), 0.0, 1.0)))
        grid = np.concatenate([p for _, p in panels], axis=1)
        Image.fromarray(grid).save(self.dir / f"{mode}_step{step:08d}.png")
        if self.tb is not None:
            for name, img in panels:
                self.tb.add_image(f"{mode}/{name}", img, step,
                                  dataformats="HWC")


class DictAverageMeter:
    """Running mean of metric dicts (reference utils.py DictAverageMeter)."""

    def __init__(self):
        self.sums: Dict[str, float] = {}
        self.count = 0

    def update(self, d: Dict[str, float], n: int = 1):
        for k, v in d.items():
            self.sums[k] = self.sums.get(k, 0.0) + float(v) * n
        self.count += n

    def mean(self) -> Dict[str, float]:
        return {k: v / max(1, self.count) for k, v in self.sums.items()}
