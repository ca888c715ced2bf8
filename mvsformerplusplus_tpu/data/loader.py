"""Host-side input pipeline: threaded prefetch, batching, balanced
multi-dataset sampling, data-parallel sharding of the sample stream.

Replaces the reference's torch DataLoader + DistributedSampler +
BalancedRandomSampler stack (datasets/data_loaders.py,
datasets/balanced_sampling.py) with a dependency-free thread-pool loader:

- TrainLoader walks a ShapeBucketSchedule (same crop scale for a whole
  global batch, deterministic per (seed, epoch) on every host);
- BalancedSchedule draws min(len(d)) samples per child dataset per epoch
  with an epoch-seeded shuffle (reference balanced_sampling.py:89-155);
- rank striding: each host keeps batches[rank::world] — the reference's
  DistributedSampler semantics;
- prefetch threads overlap disk I/O + aug with device compute (the TPU
  equivalent of num_workers + pin_memory).
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from .mvs_dataset import MVSTrainDataset, ShapeBucketSchedule


def collate(samples: List[dict]) -> dict:
    """Stack a list of samples into batched numpy arrays."""
    out = {}
    first = samples[0]
    for k, v in first.items():
        if isinstance(v, dict):
            out[k] = {kk: np.stack([s[k][kk] for s in samples]) for kk in v}
        elif isinstance(v, np.ndarray):
            out[k] = np.stack([s[k] for s in samples])
        else:
            out[k] = [s[k] for s in samples]
    return out


class TrainLoader:
    """Multi-scale bucketed training loader.

    Yields (batch dict, crop_hw) per step; batches within an epoch are
    rank-strided across `world` hosts.
    """

    def __init__(self, dataset: MVSTrainDataset, batch_size: int,
                 scales: Sequence[Tuple[int, int]],
                 scale_batch_map: Optional[Dict[str, int]] = None,
                 rank: int = 0, world: int = 1, seed: int = 0,
                 num_workers: int = 4, order_fn=None):
        """order_fn(epoch) -> index array overrides the default permutation
        (e.g. BalancedSchedule for balanced multi-dataset training)."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.schedule = ShapeBucketSchedule(
            len(dataset), scales, batch_size * world, seed)
        self.scale_batch_map = scale_batch_map or {}
        self.rank = rank
        self.world = world
        self.num_workers = num_workers
        self.order_fn = order_fn

    def steps_per_epoch(self) -> int:
        n = len(self.order_fn(0)) if self.order_fn else len(self.dataset)
        return n // (self.batch_size * self.world)

    def epoch(self, epoch: int) -> Iterator[Tuple[dict, Tuple[int, int]]]:
        batches = self.schedule.epoch(
            epoch,
            order=self.order_fn(epoch) if self.order_fn is not None else None)
        pool = ThreadPoolExecutor(max_workers=self.num_workers)
        try:
            # rank-strided global batches; this rank loads its slice of each
            pending = []
            depth = 2  # batches prefetched ahead
            my = []
            for idxs, crop_hw in batches:
                local = idxs[self.rank::self.world][: self.batch_size]
                my.append((local, crop_hw))

            def load(local_idxs, crop_hw):
                samples = [
                    self.dataset.get_sample(int(i), crop_hw, epoch)
                    for i in local_idxs
                ]
                return collate(samples), crop_hw

            it = iter(my)
            for _ in range(depth):
                try:
                    local, hw = next(it)
                    pending.append(pool.submit(load, local, hw))
                except StopIteration:
                    break
            while pending:
                fut = pending.pop(0)
                try:
                    local, hw = next(it)
                    pending.append(pool.submit(load, local, hw))
                except StopIteration:
                    pass
                yield fut.result()
        finally:
            pool.shutdown(wait=False, cancel_futures=True)


class BalancedSchedule:
    """Balanced multi-dataset sampling: per epoch draw min(len(d)) samples
    from each child (epoch-seeded), concatenate, shuffle
    (reference BalancedRandomSampler, datasets/balanced_sampling.py:89-155).

    Produces global indices into the concatenated dataset list.
    """

    def __init__(self, lengths: Sequence[int], seed: int = 0):
        self.lengths = list(lengths)
        self.offsets = np.concatenate([[0], np.cumsum(self.lengths)[:-1]])
        self.seed = seed

    def epoch(self, epoch: int) -> np.ndarray:
        rng = np.random.RandomState(self.seed * 9973 + epoch)
        n = min(self.lengths)
        picks = []
        for off, ln in zip(self.offsets, self.lengths):
            idx = rng.permutation(ln)[:n] + off
            picks.append(idx)
        allidx = np.concatenate(picks)
        rng.shuffle(allidx)
        return allidx


class ConcatDataset(MVSTrainDataset):
    """Concatenation of train datasets with shared sampling interface
    (reference CustomConcatDataset, datasets/balanced_sampling.py:16-87)."""

    def __init__(self, children: Sequence[MVSTrainDataset]):
        self.children = list(children)
        self.lengths = [len(c) for c in self.children]
        self.offsets = np.concatenate([[0], np.cumsum(self.lengths)[:-1]])

    def __len__(self):
        return int(sum(self.lengths))

    def get_sample(self, idx, crop_hw, epoch=0):
        child = int(np.searchsorted(self.offsets, idx, side="right") - 1)
        return self.children[child].get_sample(
            int(idx - self.offsets[child]), crop_hw, epoch)


class EvalLoader:
    """Sequential prefetching loader for evaluation datasets; supports
    host-sharded scan/view parallel inference (≡ the reference's manual
    per-GPU shell-script sharding, scripts/test_tt_inter.sh)."""

    def __init__(self, dataset, rank: int = 0, world: int = 1, num_workers: int = 2):
        self.dataset = dataset
        self.indices = list(range(len(dataset)))[rank::world]
        self.num_workers = num_workers

    def __len__(self):
        return len(self.indices)

    def __iter__(self):
        pool = ThreadPoolExecutor(max_workers=self.num_workers)
        try:
            pending = []
            it = iter(self.indices)
            for _ in range(2):
                try:
                    pending.append(pool.submit(self.dataset.__getitem__, next(it)))
                except StopIteration:
                    break
            while pending:
                fut = pending.pop(0)
                try:
                    pending.append(pool.submit(self.dataset.__getitem__, next(it)))
                except StopIteration:
                    pass
                yield fut.result()
        finally:
            pool.shutdown(wait=False, cancel_futures=True)
