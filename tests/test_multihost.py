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


def _run_cluster(tmp_path, mode: str) -> str:
    """Spawn the 2-process gloo cluster; returns the shared ckpt dir."""
    root = str(tmp_path / "data")
    make_synthetic_dataset(root, n_cases=6, shape=(12, 12, 12), seed=7)
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")

    from __graft_entry__ import force_host_device_count_flags

    env = dict(os.environ)
    env["XLA_FLAGS"] = force_host_device_count_flags(env.get("XLA_FLAGS", ""), 4)
    env["JAX_PLATFORMS"] = "cpu"
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), str(port), root,
             str(tmp_path / "ckpt"), mode],
            env=env,
            cwd=repo_root,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=1100)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"

    losses = [
        re.search(r"MULTIHOST_OK pid=\d+ losses=([\d.,-]+)", out).group(1)
        for out in outs
    ]
    # global-reduction losses must be bit-identical across processes
    assert losses[0] == losses[1], losses

    # the primary wrote a resumable checkpoint; the secondary wrote none
    from pcmseg_tpu.train.checkpoints import checkpoint_exists

    assert checkpoint_exists(str(tmp_path / "ckpt"), "latest")
    return str(tmp_path / "ckpt")


def test_two_process_training_cluster(tmp_path):
    _run_cluster(tmp_path, "sync")


def test_two_process_cluster_device_cache(tmp_path):
    """Multi-host device-resident dataset cache: globally-sharded stacks
    built with each process decoding only its shard
    (device_cache._build_multiprocess), in-step gathers from identical
    seed-derived index vectors, losses bit-identical across processes."""
    _run_cluster(tmp_path, "cache")


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
