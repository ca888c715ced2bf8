"""Device mesh + sharding-spec helpers.

The framework's distribution model (SURVEY.md §2.3, §5): a 2-D logical mesh

    (data, cv)

- `data`: data parallelism — batches sharded, gradients pmean'd. This axis
  subsumes the reference's entire NCCL DDP layer (train.py:29-31, 196-200):
  gradient all-reduce, SyncBatchNorm (global-batch reductions under pjit),
  and metric all-reduce all fall out of sharded jit.
- `cv`: cost-volume parallelism — source views (and/or depth hypotheses)
  partitioned; the per-view weighted-volume accumulation
  (models/cost_volume.py:97-101 in the reference) becomes a psum over ICI.

On a pod slice, `data` maps across hosts (DCN) and `cv` within hosts (ICI),
which keeps the per-step cost-volume reduction on the fast fabric.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
CV_AXIS = "cv"


def make_mesh(n_data: Optional[int] = None, n_cv: int = 1, devices=None) -> Mesh:
    """Build the (data, cv) mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data is None:
        assert n % n_cv == 0, f"{n} devices not divisible by cv={n_cv}"
        n_data = n // n_cv
    assert n_data * n_cv == n, f"mesh {n_data}x{n_cv} != {n} devices"
    arr = np.asarray(devices).reshape(n_data, n_cv)
    return Mesh(arr, (DATA_AXIS, CV_AXIS))


def batch_spec() -> P:
    """Batch tensors: leading axis over data."""
    return P(DATA_AXIS)


def view_sharded_spec() -> P:
    """[B, V, ...] tensors with views over cv."""
    return P(DATA_AXIS, CV_AXIS)


def replicated_spec() -> P:
    return P()


def shard_batch(mesh: Mesh, tree):
    """Place a host batch pytree with leading batch axes over `data`."""
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return jax.device_put(tree, sharding)


def host_local_mesh(mesh: Mesh) -> Mesh:
    """This host's sub-mesh with the same axis names.

    Per-host evaluation: validation sets are rank-strided and UNEVEN, so
    hosts run different numbers of eval steps — global-mesh collectives
    would mismatch across hosts (deadlock). Each host evaluates its slice
    on its own devices (cv stays intact: it maps within hosts), and the
    scalar (sum, n) pairs are allgathered once at the end
    (train/trainer.py validate)."""
    n_cv = mesh.shape[CV_AXIS]
    local = [d for d in mesh.devices.flat
             if d.process_index == jax.process_index()]
    assert local and len(local) % n_cv == 0, (
        f"{len(local)} local devices not divisible by cv={n_cv}")
    arr = np.asarray(local).reshape(-1, n_cv)
    return Mesh(arr, (DATA_AXIS, CV_AXIS))


def data_extent_per_process(mesh: Mesh) -> int:
    """How many `data`-axis shards this process owns (= the divisibility
    requirement on a host-local batch dimension)."""
    n_data = mesh.shape[DATA_AXIS]
    return max(1, n_data // jax.process_count())


def make_global_batch(mesh: Mesh, tree, micro: bool = False):
    """Host-local numpy batch pytree -> globally-sharded jax.Arrays over the
    `data` axis.

    This is the TPU equivalent of the reference's per-rank batch split under
    DDP (reference train.py:39, DistributedSampler): every host feeds its
    rank-strided slice; `jax.make_array_from_process_local_data` assembles
    the logical global array (single-process it's just a sharded device_put).

    micro=True: leaves carry a leading [n_micro, B_local, ...] axis
    (gradient-accumulation split) — only the second axis is data-sharded.
    """
    spec = P(None, DATA_AXIS) if micro else P(DATA_AXIS)
    sharding = NamedSharding(mesh, spec)

    def put(x):
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    return jax.tree.map(put, tree)


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)
