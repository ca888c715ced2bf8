"""Tracing/profiling as a first-class subsystem (SURVEY.md §5: the reference
has only wall-clock timing with cuda.synchronize, test.py:239-262; on TPU we
get real traces).

- `trace(logdir)`: context manager around jax.profiler.trace — produces
  xprof/perfetto traces viewable in TensorBoard or ui.perfetto.dev.
- `annotate(name)`: TraceAnnotation for labeling model phases inside jit.
- `Stopwatch`: dispatch-aware wall-clock timing (block_until_ready).
- `device_memory_stats()`: live HBM usage (≡ torch.cuda.max_memory_allocated
  probes the reference comments out, trainer:187-188).
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str, create_perfetto_link: bool = False):
    jax.profiler.start_trace(logdir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Label a region inside traced computations."""
    return jax.profiler.TraceAnnotation(name)


class Stopwatch:
    """Wall-clock timing that respects async dispatch."""

    def __init__(self):
        self.times: Dict[str, list] = {}

    @contextlib.contextmanager
    def measure(self, name: str):
        """Wall-clock a block. The block itself must block on its device
        work (e.g. end with jax.block_until_ready(out)) — a `result=`
        argument evaluated at context ENTRY could never be the block's
        output, so none is offered; use `time_fn` for the dispatch-aware
        form."""
        t0 = time.time()
        try:
            yield
        finally:
            self.times.setdefault(name, []).append(time.time() - t0)

    def time_fn(self, name: str, fn, *args, iters: int = 5, warmup: int = 1):
        out = None
        for _ in range(warmup):
            out = fn(*args)
        if out is not None:
            jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / iters
        self.times.setdefault(name, []).append(dt)
        return out, dt

    def summary(self) -> Dict[str, float]:
        return {k: sum(v) / len(v) for k, v in self.times.items()}


def device_memory_stats(device=None) -> Dict[str, int]:
    device = device or jax.devices()[0]
    stats = device.memory_stats() or {}
    return {
        "bytes_in_use": stats.get("bytes_in_use", 0),
        "peak_bytes_in_use": stats.get("peak_bytes_in_use", 0),
        "bytes_limit": stats.get("bytes_limit", 0),
    }
