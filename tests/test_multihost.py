"""Simulated multi-host pod: 2 processes x 4 virtual CPU devices (gloo).

The reference scales across nodes with Lightning DDP + NCCL
(reference CGAT/train.py:100-104). Here the same 8-way training runs once
in-process (single-process, 8 devices) and once as two coordinated processes
(jax.distributed + process-sliced loaders + make_array_from_callback
globalisation) — the trajectories must match.
"""
import os
import pickle
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
@pytest.mark.parametrize("edge", [1, 2])
def test_two_process_training_matches_single_process(tmp_path, edge):
    # single-process trajectory, same code path (8 devices via conftest)
    from _multihost_worker import run
    ref_path = tmp_path / "single.pkl"
    run(str(ref_path), edge)
    with open(ref_path, "rb") as f:
        ref = pickle.load(f)
    assert len(ref["losses"]) == 3

    port = _free_port()
    procs, outs = [], []
    for pid in range(2):
        env = dict(os.environ)
        env.update({
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
            "JAX_COORDINATOR_ADDRESS": f"localhost:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
        })
        out = tmp_path / f"multi_{pid}.pkl"
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, str(out), str(edge)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    logs = []
    for p in procs:
        try:
            log, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(log)
    assert all(p.returncode == 0 for p in procs), \
        "worker failed:\n" + "\n----\n".join(logs)

    with open(outs[0], "rb") as f:
        multi = pickle.load(f)
    np.testing.assert_allclose(multi["losses"], ref["losses"],
                               rtol=1e-5, atol=1e-7)
    import jax
    # 3 AdamW steps amplify float-level collective-order noise to O(lr);
    # lr-scale tolerance as in test_parallel.py
    for a, b in zip(jax.tree.leaves(multi["params"]),
                    jax.tree.leaves(ref["params"])):
        np.testing.assert_allclose(a, b, rtol=1e-2, atol=1e-3)


@pytest.mark.slow
def test_two_process_streaming_matches_single_process(tmp_path):
    """Out-of-core streaming across a simulated 2-host pod: every process
    streams all shards, collates only its own dp rows; the loss trajectory
    must match the single-process streaming run."""
    import json

    import test_streaming as ts
    from cgat_tpu.tools import shards as sh

    pool = str(tmp_path / "pool")
    os.makedirs(pool)
    for i in range(3):
        sh.save_pickle(ts.make_prepared(16, id_offset=i * 16, seed=i),
                       sh.shard_path(i, pool))
    fea = str(tmp_path / "fea16.json")
    rng = np.random.default_rng(42)
    with open(fea, "w") as f:
        json.dump({el: rng.standard_normal(16).tolist()
                   for el in ts.ELEMENTS}, f)

    from _multihost_worker import run
    ref_path = tmp_path / "single_stream.pkl"
    run(str(ref_path), 1, pool, fea)
    with open(ref_path, "rb") as f:
        ref = pickle.load(f)
    assert len(ref["losses"]) == 3

    port = _free_port()
    procs, outs = [], []
    for pid in range(2):
        env = dict(os.environ)
        env.update({
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
            "JAX_COORDINATOR_ADDRESS": f"localhost:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
        })
        out = tmp_path / f"multi_stream_{pid}.pkl"
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, str(out), "1", pool, fea], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    logs = []
    for p in procs:
        try:
            log, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(log)
    assert all(p.returncode == 0 for p in procs), \
        "worker failed:\n" + "\n----\n".join(logs)

    with open(outs[0], "rb") as f:
        multi = pickle.load(f)
    np.testing.assert_allclose(multi["losses"], ref["losses"],
                               rtol=1e-5, atol=1e-7)
