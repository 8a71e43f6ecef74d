#!/usr/bin/env python
"""Benchmark: MRI volumes/sec/chip for the flagship 3D U-Net train step.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

The workload is the reference's headline configuration (BASELINE.md):
5-modality 128^3 volumes through the ~90M-param base-64 3D U-Net,
full training step (fwd + Dice loss + bwd + grad clip + Adam + BN update),
bf16 compute, remat, on one chip.

``vs_baseline`` compares against the PyTorch-CPU reference throughput
recorded in BASELINE_MEASURED.json (measured once with
tools/measure_torch_baseline.py, since the reference publishes no numbers
— BASELINE.md). Falls back to vs_baseline=None if the file is missing.
"""

import json
import os
import time

import jax
import numpy as np


def main():
    from pcmseg_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    from pcmseg_tpu.core.config import get_config
    from pcmseg_tpu.models import UNet3D
    from pcmseg_tpu.train.steps import (
        create_train_state,
        jit_train_step,
        make_train_step,
    )

    # Measured on one v5e chip (15.75 GB HBM), 128^3 bf16:
    #   batch 4 via 4x grad accumulation : 3.55 vol/s  <- default (the
    #     reference's high_performance batch-4 semantics; microbatches run
    #     remat-free and the scan amortizes the optimizer update)
    #   batch 1, remat off               : 3.44 vol/s
    #   batch 2, remat on                : 3.03 vol/s
    #   batch 2 monolithic no-remat / batch 4 monolithic: OOM (~25 GB
    #     conv-gradient col buffers)
    # Override with BENCH_BATCH / BENCH_ACCUM / BENCH_REMAT=1.
    batch = int(os.environ.get("BENCH_BATCH", "4"))
    size = int(os.environ.get("BENCH_SIZE", "128"))
    steps = int(os.environ.get("BENCH_STEPS", "10"))
    accum = int(os.environ.get("BENCH_ACCUM", "4"))  # grad accumulation
    remat = os.environ.get("BENCH_REMAT", "0") == "1" or batch // accum > 1

    config = get_config(
        "standard",
        batch_size=batch,
        accum_steps=accum,
        target_size=(size, size, size),
        compute_dtype="bfloat16",
        remat=remat,
    )
    model = UNet3D.from_config(config)
    state = create_train_state(
        config, jax.random.key(0), model, (batch, size, size, size, 5)
    )
    step = jit_train_step(make_train_step(model, config), donate=True)

    rng = np.random.default_rng(0)
    image = jax.device_put(
        rng.normal(size=(batch, size, size, size, 5)).astype(np.float32)
    )
    label = jax.device_put(
        (rng.random((batch, size, size, size, 1)) > 0.9).astype(np.float32)
    )
    batch_data = {"image": image, "label": label}

    # warmup / compile (scalar fetch = true completion barrier: on tunneled
    # TPU backends block_until_ready can ack before device completion, so
    # every timing boundary here is a device-to-host value fetch)
    state, metrics = step(state, batch_data)
    float(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step(state, batch_data)
    final_loss = float(metrics["loss"])  # depends on the whole step chain
    dt = time.perf_counter() - t0
    assert np.isfinite(final_loss)

    vols_per_sec = batch * steps / dt

    vs_baseline = None
    baseline_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BASELINE_MEASURED.json"
    )
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            baseline = json.load(f)
        ref = baseline.get("torch_cpu_volumes_per_sec")
        if ref is not None and ref > 0:
            vs_baseline = vols_per_sec / ref

    print(
        json.dumps(
            {
                "metric": "train_volumes_per_sec_per_chip "
                          f"(5-mod {size}^3 3D U-Net fwd+bwd, batch {batch})",
                "value": round(vols_per_sec, 4),
                "unit": "volumes/sec/chip",
                "vs_baseline": (
                    round(vs_baseline, 2) if vs_baseline is not None else None
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
