"""Worker process for tests/test_multihost.py: multi-process CPU cluster.

Run as: python _multihost_worker.py <process_id> <port> <data_dir> <save_dir>
        [sync|async|cache|ref|crash|resume] [num_processes]
Each process owns ``8 // num_processes`` virtual CPU devices (XLA_FLAGS set
by the spawner); the mesh spans all 8 across the cluster. Trains the tiny
UNet3D through the full Trainer path — per-process batch slices, global
batches via make_array_from_process_local_data, GSPMD gradient all-reduce
over gloo, and a multi-host Orbax checkpoint save (background writer thread
when 'async': coordination-service barriers only, no device collectives off
the main thread — see checkpoints.py _process_barrier).

Fault-injection modes (VERDICT round-3 next #8):
  * ``ref``    — 3 epochs straight through (the uninterrupted reference).
  * ``crash``  — process 1 hard-exits (os._exit) after the FIRST train
                 step of epoch 1, mid-collective for everyone else; the
                 spawner reaps the survivors. Epoch 0's 'latest' must
                 survive (atomic symlink-swap saves).
  * ``resume`` — 3 epochs with resume=True: restarts from the durable
                 'latest' and must reproduce ``ref``'s losses
                 bit-identically.
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
    nproc = int(sys.argv[6]) if len(sys.argv) > 6 else 2
    async_ckpt = mode == "async"
    use_cache = mode in ("cache", "pcache")
    # NOTE: no persistent compile cache here — measured on the 1-core
    # host, a cache HIT on one process while a peer still compiles skews
    # their arrival at the first collective past gloo's 30 s
    # context-init timeout (GetKeyValue DEADLINE_EXCEEDED) and kills the
    # cluster; compiling in lockstep is slower but reliable.
    multihost.initialize(
        f"localhost:{port}", num_processes=nproc, process_id=pid
    )
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    assert multihost.is_multiprocess()
    assert multihost.is_primary() == (pid == 0)
    # gloo context rendezvous NOW, while processes are aligned (see
    # multihost.establish_collectives — the real step's compile skew on
    # a loaded 1-core host can exceed gloo's 30 s init window), then
    # re-align before the heavy compile so execution skew stays small
    multihost.establish_collectives()
    multihost.barrier(f"pcmseg_worker_start_{mode}")

    from pcmseg_tpu.core.config import get_config
    from pcmseg_tpu.train.trainer import Trainer

    fault_modes = ("ref", "crash", "resume")
    config = get_config(
        "quick",
        data_dir=data_dir,
        save_dir=save_dir,
        base_features=4,
        remat=False,
        compute_dtype="float32",
        target_size=(16, 16, 16),
        batch_size=8 if mode not in fault_modes else 4,
        num_epochs=2 if mode not in fault_modes else 3,
        validation=False,
        early_stopping=False,
        data_parallel=8,
        async_checkpoint=async_ckpt,
        # 'pcache': budget sized so only ~8 of the 12 cases fit → the
        # PARTIAL cache engages (resident subset + streamed remainder,
        # interleaved dispatch) across the 2-process cluster
        device_data_cache_gb=(
            1.0 if mode == "cache"
            else (8.5 * 16**3 * 11) / (8 * 1e9) if mode == "pcache"
            else 0.0
        ),
        resume=(mode == "resume"),
    )
    trainer = Trainer(config)
    assert trainer.process_count == nproc
    assert trainer._async_ckpt == async_ckpt
    if use_cache:
        # the multi-process device-resident cache must be active: batches
        # gathered on device from globally-sharded stacks, no streaming
        assert trainer._dcache is not None
    if mode == "pcache":
        assert trainer._dcache_partial, "partial cache should engage"
        assert trainer._stream_train_loader is not None
        assert trainer._dcache["images"].shape[0] >= 8  # padded to dp
    if mode == "crash":
        # hard-kill process 1 right after the first optimizer step of
        # epoch 1 (so epoch 0's checkpoint exists and the death lands
        # mid-epoch, mid-collective for the surviving processes)
        orig_step = trainer._train_step
        calls = {"n": 0}
        steps_per_epoch = -(-len(trainer.train_indices) // config.batch_size)

        def wrapped(state, batch):
            out = orig_step(state, batch)
            calls["n"] += 1
            if pid == 1 and calls["n"] == steps_per_epoch + 1:
                jax.block_until_ready(out[1]["loss"])
                import os as _os

                sys.stdout.write(f"CRASHING pid={pid}\n")
                sys.stdout.flush()
                _os._exit(1)
            return out

        trainer._train_step = wrapped
    history = trainer.train()
    losses = history["train_loss"]
    assert np.isfinite(losses).all(), losses
    # losses are global reductions → identical on every process
    txt = ",".join(f"{l:.6f}" for l in losses)
    print(f"MULTIHOST_OK pid={pid} losses={txt}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
