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
    from pcmseg_tpu.core.config import get_config
    from pcmseg_tpu.models import UNet3D
    from pcmseg_tpu.train.steps import (
        create_train_state,
        jit_train_step,
        make_train_step,
    )

    batch = int(os.environ.get("BENCH_BATCH", "4"))  # high_performance preset
    size = int(os.environ.get("BENCH_SIZE", "128"))
    steps = int(os.environ.get("BENCH_STEPS", "10"))

    config = get_config(
        "high_performance",
        batch_size=batch,
        target_size=(size, size, size),
        compute_dtype="bfloat16",
        remat=True,
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

    # warmup / compile
    state, metrics = step(state, batch_data)
    jax.block_until_ready(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step(state, batch_data)
    jax.block_until_ready(metrics["loss"])
    dt = time.perf_counter() - t0

    vols_per_sec = batch * steps / dt

    vs_baseline = None
    baseline_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BASELINE_MEASURED.json"
    )
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            baseline = json.load(f)
        ref = baseline.get("torch_cpu_volumes_per_sec")
        if ref:
            vs_baseline = vols_per_sec / ref

    print(
        json.dumps(
            {
                "metric": "train_volumes_per_sec_per_chip "
                          f"(5-mod {size}^3 3D U-Net fwd+bwd, batch {batch})",
                "value": round(vols_per_sec, 4),
                "unit": "volumes/sec/chip",
                "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
            }
        )
    )


if __name__ == "__main__":
    main()
