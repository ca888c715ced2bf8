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
