"""Work-stealing scan scheduler for multi-worker evaluation.

The reference shards T&T/DTU evaluation by hand: each worker gets a static
slice of the scan list (scripts/test_tt_inter.sh:3,37 runs the CLI once per
scene with hand-picked params; our --rank/--world striding mirrors that).
Static slices leave workers idle when per-scene work is skewed (SURVEY §7
names per-scene variable work as the scaling risk: T&T scenes differ 4x in
view count and resolution).

This queue makes the split dynamic with no coordinator and no network: all
workers share the output filesystem (the eval already requires that), and a
task is CLAIMED by atomically creating `<dir>/.claims/<task>.claim` with
O_CREAT|O_EXCL — exactly-once across any number of workers, including
workers that join late. A finished task writes `<task>.done`; on restart,
done tasks are skipped and stale claims (a crashed worker's) can be
reclaimed with `reclaim_stale`.

Usage:
    q = WorkQueue(outdir, scan_names)
    for scan in q:          # yields tasks this worker claimed
        process(scan)
        q.mark_done(scan)
"""
from __future__ import annotations

import os
import time
from pathlib import Path
from typing import Iterable, Iterator, List, Optional


class WorkQueue:
    """Filesystem-atomic dynamic task queue (work stealing via claims)."""

    def __init__(self, root, tasks: Iterable[str],
                 worker: Optional[str] = None,
                 reclaim_stale_s: Optional[float] = None):
        self.root = Path(root) / ".claims"
        self.root.mkdir(parents=True, exist_ok=True)
        self.tasks: List[str] = list(tasks)
        self.worker = worker or f"pid{os.getpid()}"
        self.reclaim_stale_s = reclaim_stale_s

    def _claim_path(self, task: str) -> Path:
        return self.root / f"{task}.claim"

    def _done_path(self, task: str) -> Path:
        return self.root / f"{task}.done"

    def _try_claim(self, task: str) -> bool:
        if self._done_path(task).exists():
            return False
        path = self._claim_path(task)
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            if self.reclaim_stale_s is None:
                return False
            # crashed-worker recovery: a claim whose mtime (refreshed by the
            # owner's heartbeat()) is older than the threshold with no .done
            # is presumed dead. The steal must be ATOMIC under contention:
            # rename the stale claim to a tombstone — exactly one renamer
            # succeeds (the source vanishes for the rest) — then compete for
            # the freed slot through the O_EXCL create above. Ownership is
            # ALWAYS decided by the O_EXCL create, so two stealers can never
            # both win.
            try:
                age = time.time() - path.stat().st_mtime
            except FileNotFoundError:
                return self._try_claim(task)
            if age < self.reclaim_stale_s:
                return False
            tomb = self.root / f"{task}.stale.{self.worker}.{time.time_ns()}"
            try:
                os.rename(path, tomb)
            except FileNotFoundError:
                pass  # another stealer freed it first; compete anyway
            return self._try_claim(task)
        with os.fdopen(fd, "w") as f:
            f.write(self.worker)
        return True

    def heartbeat(self, task: str) -> None:
        """Refresh the claim's liveness stamp. Owners of long-running tasks
        call this periodically (e.g. once per view) so `reclaim_stale_s` can
        be set well below a scene's total runtime without healthy tasks
        getting stolen."""
        try:
            os.utime(self._claim_path(task))
        except FileNotFoundError:
            pass  # claim was stolen after a missed-heartbeat window

    def __iter__(self) -> Iterator[str]:
        for task in self.tasks:
            if self._try_claim(task):
                yield task

    def mark_done(self, task: str) -> None:
        self._done_path(task).write_text(self.worker)

    def pending(self) -> List[str]:
        return [t for t in self.tasks if not self._done_path(t).exists()]
