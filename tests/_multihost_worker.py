"""Worker process for tests/test_multihost.py: 2-process CPU cluster.

Run as: python _multihost_worker.py <process_id> <port> <data_dir> <save_dir>
Each process owns 4 virtual CPU devices (XLA_FLAGS set by the spawner); the
mesh spans all 8 across both processes. Trains the tiny UNet3D for 2 epochs
through the full Trainer path — per-process batch slices, global batches via
make_array_from_process_local_data, GSPMD gradient all-reduce over gloo, and
a multi-host Orbax checkpoint save.
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
    )
    trainer = Trainer(config)
    assert trainer.process_count == 2
    history = trainer.train()
    losses = history["train_loss"]
    assert len(losses) == 2 and np.isfinite(losses).all(), losses
    # losses are global reductions → identical on every process
    print(f"MULTIHOST_OK pid={pid} losses={losses[0]:.6f},{losses[1]:.6f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
