"""REAL multi-process data parallelism on CPU (SURVEY §2.3 multi-node DP).

The single-process virtual-mesh tests (test_parallel.py, dryrun_multichip)
cannot exercise what multi-HOST training actually stresses: per-process
device ownership, host-sharded batch assembly
(jax.make_array_from_process_local_data), the host-local-mesh validation
path with UNEVEN per-host val sets, the (sum, n) allgather metric merge,
and orbax checkpointing with every process participating. This test runs
the production Trainer across 2 OS processes (4 virtual CPU devices each)
joined via jax.distributed over local TCP — the same code path
`train.py --distributed` uses on a real pod.
"""
import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_data_parallel_training(tmp_path):
    port = _free_port()
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        PALLAS_AXON_POOL_IPS="",
        PYTHONPATH=str(REPO),
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
        JAX_NUM_CPU_COLLECTIVES_THREADS="4",
    )
    procs = []
    outs = []
    for rank in range(2):
        out = tmp_path / f"result_{rank}.json"
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, str(REPO / "tests" / "mp_driver.py"),
             "--rank", str(rank), "--nprocs", "2", "--port", str(port),
             "--save_dir", str(tmp_path / "saved"), "--out", str(out)],
            env=env, cwd=str(REPO),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    logs = []
    for p in procs:
        try:
            log, _ = p.communicate(timeout=1500)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process run deadlocked (collective "
                        "mismatch across hosts?)")
        logs.append(log)
    for rank, (p, log) in enumerate(zip(procs, logs)):
        assert p.returncode == 0, f"rank {rank}:\n{log[-4000:]}"

    r0 = json.loads(outs[0].read_text())
    r1 = json.loads(outs[1].read_text())
    # 8 global devices across 2 processes; state lives on the full mesh
    assert r0["n_devices"] == r1["n_devices"] == 8
    assert r0["state_on_full_mesh"] and r1["state_on_full_mesh"]
    # state is replicated: training must produce IDENTICAL params on both
    # hosts (gradient all-reduce correctness)
    assert r0["params_checksum"] == r1["params_checksum"]
    # checkpoint round-trip restores what was saved
    assert r0["restored_checksum"] == r0["params_checksum"]
    # uneven val sets (2 vs 1 batches) still produce the SAME merged
    # metrics on every host (count-weighted allgather, no deadlock)
    assert r0["n_local_val"] == 2 and r1["n_local_val"] == 1
    assert r0["val"] == r1["val"], (r0["val"], r1["val"])
    assert "mean_error" in r0["val"]
