"""Worker process for tests/test_multihost.py: 2-process CPU cluster.

Run as: python _multihost_worker.py <process_id> <port> <data_dir> <save_dir>
        [sync|async]
Each process owns 4 virtual CPU devices (XLA_FLAGS set by the spawner); the
mesh spans all 8 across both processes. Trains the tiny UNet3D for 2 epochs
through the full Trainer path — per-process batch slices, global batches via
make_array_from_process_local_data, GSPMD gradient all-reduce over gloo, and
a multi-host Orbax checkpoint save (background writer thread when 'async':
coordination-service barriers only, no device collectives off the main
thread — see checkpoints.py _process_barrier).
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from pcmseg_tpu.parallel import multihost  # noqa: E402


def main() -> int:
    pid, port, data_dir, save_dir = (
        int(sys.argv[1]),
        sys.argv[2],
        sys.argv[3],
        sys.argv[4],
    )
    mode = sys.argv[5] if len(sys.argv) > 5 else "sync"
    async_ckpt = mode == "async"
    use_cache = mode == "cache"
    multihost.initialize(f"localhost:{port}", num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    assert multihost.is_multiprocess()
    assert multihost.is_primary() == (pid == 0)

    from pcmseg_tpu.core.config import get_config
    from pcmseg_tpu.train.trainer import Trainer

    config = get_config(
        "quick",
        data_dir=data_dir,
        save_dir=save_dir,
        base_features=4,
        remat=False,
        compute_dtype="float32",
        target_size=(16, 16, 16),
        batch_size=8,
        num_epochs=2,
        validation=False,
        early_stopping=False,
        data_parallel=8,
        async_checkpoint=async_ckpt,
        device_data_cache_gb=1.0 if use_cache else 0.0,
    )
    trainer = Trainer(config)
    assert trainer.process_count == 2
    assert trainer._async_ckpt == async_ckpt
    if use_cache:
        # the multi-process device-resident cache must be active: batches
        # gathered on device from globally-sharded stacks, no streaming
        assert trainer._dcache is not None
    history = trainer.train()
    losses = history["train_loss"]
    assert len(losses) == 2 and np.isfinite(losses).all(), losses
    # losses are global reductions → identical on every process
    print(f"MULTIHOST_OK pid={pid} losses={losses[0]:.6f},{losses[1]:.6f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
