"""Multi-host scale-out: per-host data feeding + 2-process CPU cluster.

Validates VERDICT round-1 item #6: ``jax.distributed.initialize`` path,
per-process sharding of batches, ``jax.make_array_from_process_local_data``
global batches, and a full Trainer run (including a multi-host Orbax
checkpoint save) across two real OS processes with gloo CPU collectives.
"""

import pytest

# compile-heavy on a 1-core host (measured; see pyproject's marker
# registration) - excluded from the quick lane `pytest -m 'not slow'`
pytestmark = pytest.mark.slow

import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

from pcmseg_tpu.data.synthetic import make_synthetic_dataset
from pcmseg_tpu.parallel.multihost import process_local_indices


def test_process_local_indices_partition():
    idxs = list(range(10))
    shards = [process_local_indices(idxs, i, 3) for i in range(3)]
    assert shards[0] == [0, 3, 6, 9]
    assert shards[1] == [1, 4, 7]
    assert shards[2] == [2, 5, 8]
    assert sorted(sum(shards, [])) == idxs


def test_loader_process_shard_slices_global_batches(tmp_path):
    from pcmseg_tpu.data.dataset import ProstateDataset
    from pcmseg_tpu.data.loader import DataLoader

    root = str(tmp_path / "data")
    make_synthetic_dataset(root, n_cases=6, shape=(12, 12, 12), seed=5)
    ds = ProstateDataset(data_dir=root, target_size=(16, 16, 16))

    def batches(pi):
        loader = DataLoader(
            ds, batch_size=4, shuffle=False, pad_to=4, process_shard=(pi, 2)
        )
        return list(loader)

    b0, b1 = batches(0), batches(1)
    assert len(b0) == len(b1) == 2
    for a, b in zip(b0, b1):
        assert a["image"].shape[0] == b["image"].shape[0] == 2  # 4 global / 2
    # the global tail batch holds cases 5,6 + 2 padded: host 0 gets the two
    # real samples, host 1 the two weight-0 padded ones
    assert b0[1]["weight"].tolist() == [1.0, 1.0]
    assert b1[1]["weight"].tolist() == [0.0, 0.0]
    # global batch = concat of host slices, no overlap
    assert b0[0]["case_id"] + b1[0]["case_id"] == ds.case_ids[:4]


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _spawn_cluster(tmp_path, mode: str, n_processes: int, root: str,
                   ckpt: str):
    """Spawn the n-process gloo cluster (8 virtual devices split evenly)."""
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")

    from __graft_entry__ import force_host_device_count_flags

    env = dict(os.environ)
    env["XLA_FLAGS"] = force_host_device_count_flags(
        env.get("XLA_FLAGS", ""), 8 // n_processes
    )
    env["JAX_PLATFORMS"] = "cpu"
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")

    return [
        subprocess.Popen(
            [sys.executable, worker, str(pid), str(port), root, ckpt,
             mode, str(n_processes)],
            env=env,
            cwd=repo_root,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(n_processes)
    ]


def _collect_losses(procs, timeout=1100):
    outs = [p.communicate(timeout=timeout)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"
    losses = [
        re.search(r"MULTIHOST_OK pid=\d+ losses=([\d.,-]+)", out).group(1)
        for out in outs
    ]
    # global-reduction losses must be bit-identical across processes
    assert all(l == losses[0] for l in losses), losses
    return losses[0]


def _run_cluster(tmp_path, mode: str, n_processes: int = 2,
                 n_cases: int = 6) -> str:
    """Spawn the cluster; returns the shared ckpt dir."""
    root = str(tmp_path / "data")
    make_synthetic_dataset(root, n_cases=n_cases, shape=(12, 12, 12), seed=7)
    ckpt = str(tmp_path / "ckpt")
    procs = _spawn_cluster(tmp_path, mode, n_processes, root, ckpt)
    _collect_losses(procs)

    # the primary wrote a resumable checkpoint; the others wrote none
    from pcmseg_tpu.train.checkpoints import checkpoint_exists

    assert checkpoint_exists(ckpt, "latest")
    return ckpt


def test_two_process_training_cluster(tmp_path):
    _run_cluster(tmp_path, "sync")


def test_two_process_cluster_device_cache(tmp_path):
    """Multi-host device-resident dataset cache: globally-sharded stacks
    built with each process decoding only its shard
    (device_cache._build_multiprocess), in-step gathers from identical
    seed-derived index vectors, losses bit-identical across processes."""
    _run_cluster(tmp_path, "cache")


def test_two_process_cluster_partial_device_cache(tmp_path):
    """PARTIAL device cache across a 2-process cluster: only ~8 of 12
    cases fit the budget — the resident subset is globally sharded
    (each process decodes only its shard), the remainder streams through
    process-sharded global batches, and the interleaved dispatch
    schedule (a pure function of batch counts) keeps every process in
    lockstep: losses bit-identical."""
    _run_cluster(tmp_path, "pcache", n_cases=12)


def test_two_process_cluster_async_checkpoints(tmp_path):
    """Multi-host ASYNC saves: background writer threads on every process,
    coordination-service barriers only (no device collectives off the main
    thread), epoch-1 state durable and 'best' present as a payload copy."""
    import json

    ckpt = _run_cluster(tmp_path, "async")
    meta = json.load(open(os.path.join(ckpt, "latest", "meta.json")))
    assert meta["epoch"] == 1  # both epochs' saves landed, last one wins
    from pcmseg_tpu.train.checkpoints import checkpoint_exists

    assert checkpoint_exists(ckpt, "best")


def test_four_process_training_cluster(tmp_path):
    """4 processes × 2 virtual devices, UNEVEN per-process case counts
    (7 cases over 4 processes → 2/2/2/1): the loader's process shards
    stay aligned via weight-masked padding and losses are bit-identical
    on every process (VERDICT round-3 next #8)."""
    _run_cluster(tmp_path, "sync", n_processes=4, n_cases=7)


def test_cluster_kill_one_process_then_resume(tmp_path):
    """Fault injection: process 1 hard-dies after the first step of
    epoch 1; the durable epoch-0 'latest' survives (atomic saves), and a
    full-cluster restart with resume=True reproduces the uninterrupted
    reference run's losses bit-identically (VERDICT round-3 next #8)."""
    import json
    import time

    root = str(tmp_path / "data")
    make_synthetic_dataset(root, n_cases=6, shape=(12, 12, 12), seed=7)

    # (a) uninterrupted reference: 3 epochs straight
    ref_ckpt = str(tmp_path / "ckpt_ref")
    ref_losses = _collect_losses(
        _spawn_cluster(tmp_path, "ref", 4, root, ref_ckpt)
    )
    assert ref_losses.count(",") == 2  # 3 epochs

    # (b) crash run: pid 1 os._exit(1)s mid-epoch-1; reap the survivors
    # (they block in a collective against the dead peer)
    ckpt = str(tmp_path / "ckpt_crash")
    procs = _spawn_cluster(tmp_path, "crash", 4, root, ckpt)
    deadline = time.time() + 1100
    while procs[1].poll() is None and time.time() < deadline:
        time.sleep(1.0)
    assert procs[1].poll() == 1, "worker 1 should have crashed with rc 1"
    # give survivors a moment, then terminate the hung ones
    time.sleep(2.0)
    for p in (procs[0], procs[2], procs[3]):
        if p.poll() is None:
            p.terminate()
    for p in procs:
        try:
            p.communicate(timeout=60)
        except subprocess.TimeoutExpired:
            p.kill()
            p.communicate()

    # the epoch-0 checkpoint survived the mid-epoch-1 cluster death
    from pcmseg_tpu.train.checkpoints import checkpoint_exists

    assert checkpoint_exists(ckpt, "latest")
    meta = json.load(open(os.path.join(ckpt, "latest", "meta.json")))
    assert meta["epoch"] == 0

    # (c) restart the WHOLE cluster with resume=True → bit-identical
    # continuation (epoch 0 restored from history, epochs 1-2 recomputed)
    res_losses = _collect_losses(
        _spawn_cluster(tmp_path, "resume", 4, root, ckpt)
    )
    assert res_losses == ref_losses, (res_losses, ref_losses)


def test_make_global_batch_single_process():
    """Degenerate 1-process case: equals plain sharded device_put."""
    import jax

    from pcmseg_tpu.parallel.multihost import make_global_batch
    from pcmseg_tpu.parallel.sharding import make_mesh

    mesh = make_mesh(2, 1, 1, devices=jax.devices()[:2])
    batch = {
        "image": np.arange(32, dtype=np.float32).reshape(2, 2, 2, 2, 2),
        "weight": np.ones((2,), np.float32),
        "case_id": ["a", "b"],
    }
    out = make_global_batch(batch, mesh)
    assert out["case_id"] == ["a", "b"]
    np.testing.assert_array_equal(np.asarray(out["image"]), batch["image"])
    assert out["image"].sharding.spec[0] == "data"
