#!/usr/bin/env python
"""Extended benchmark suite — the five BASELINE.json headline configs.

Prints one JSON line per config (bench.py stays the driver's single-line
entry; this is the full matrix for humans):

 1. quick-path training step, batch 1 (train_bph.py-shaped workload)
 2. optimized training step, batch 4 (train_bph_optimized.py-shaped)
 3. data pipeline with missing-modality strategies (PCA-shaped, host-side)
 4. 5-fold CV fold-setup overhead (fresh state per fold)
 5. sliding-window full-volume inference at 160^3 with 128^3 windows

Usage: python bench_suite.py [--quick]   (--quick shrinks sizes for smoke)
"""

import argparse
import json
import time

import jax
import numpy as np


def _line(name, value, unit, extra=None):
    payload = {"metric": name, "value": round(value, 4), "unit": unit}
    if extra:
        payload.update(extra)
    print(json.dumps(payload), flush=True)


def bench_train_step(batch, size, steps, features=64, tag=""):
    from pcmseg_tpu.core.config import get_config
    from pcmseg_tpu.models import UNet3D
    from pcmseg_tpu.train.steps import (
        create_train_state,
        jit_train_step,
        make_train_step,
    )

    config = get_config(
        "standard",
        batch_size=batch,
        base_features=features,
        target_size=(size, size, size),
        compute_dtype="bfloat16",
        remat=batch > 1,  # batch 1 fits without remat (13% faster)
    )
    model = UNet3D.from_config(config)
    state = create_train_state(
        config, jax.random.key(0), model, (batch, size, size, size, 5)
    )
    step = jit_train_step(make_train_step(model, config), donate=True)
    rng = np.random.default_rng(0)
    data = {
        "image": jax.device_put(
            rng.normal(size=(batch, size, size, size, 5)).astype(np.float32)
        ),
        "label": jax.device_put(
            (rng.random((batch, size, size, size, 1)) > 0.9).astype(np.float32)
        ),
    }
    # value fetch = true completion barrier on the tunneled TPU backend
    state, m = step(state, data)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = step(state, data)
    float(m["loss"])
    dt = time.perf_counter() - t0
    _line(
        f"train_step{tag} (batch {batch}, {size}^3, base {features})",
        batch * steps / dt,
        "volumes/sec/chip",
    )


def bench_data_pipeline(quick):
    import tempfile

    from pcmseg_tpu.data.loader import get_dataloader
    from pcmseg_tpu.data.synthetic import make_synthetic_dataset

    with tempfile.TemporaryDirectory() as root:
        shape = (48, 48, 48) if not quick else (16, 16, 16)
        target = (64, 64, 64) if not quick else (16, 16, 16)
        make_synthetic_dataset(
            root, n_cases=8, data_type="PCA", shape=shape,
            drop_modalities={"case001": ["DWI"], "case002": ["T2 fs"]},
        )
        for strategy in ("zero_fill", "duplicate", "skip"):
            loader = get_dataloader(
                root, batch_size=2, data_type="PCA",
                missing_strategy=strategy, target_size=target,
                shuffle=False, num_workers=4,
            )
            t0 = time.perf_counter()
            n = sum(b["image"].shape[0] for b in loader)
            dt = time.perf_counter() - t0
            _line(
                f"data_pipeline_{strategy} (resample->{target[0]}^3, 5 mods)",
                n / dt,
                "volumes/sec (host)",
                {"cases": n},
            )


def bench_sliding_window(quick):
    from pcmseg_tpu.core.config import get_config
    from pcmseg_tpu.infer.predict import Predictor  # noqa: F401 (import check)
    from pcmseg_tpu.infer.sliding_window import sliding_window_predict
    from pcmseg_tpu.models import UNet3D

    size = 160 if not quick else 24
    window = 128 if not quick else 16
    features = 64 if not quick else 4
    config = get_config(
        "standard", base_features=features,
        window_size=(window,) * 3, compute_dtype="bfloat16",
    )
    model = UNet3D.from_config(config)
    v = jax.device_put(model.init_variables(jax.random.key(0), (1, 16, 16, 16, 5)))

    # variables as an explicit arg: closures over params can inline hundreds
    # of MB into the (tunneled) compile payload
    _apply = jax.jit(
        lambda vars_, x: model.apply(vars_, x, method=UNet3D.predict)
    )

    def predict(x):
        return _apply(v, x)

    img = np.random.default_rng(0).normal(size=(size, size, size, 5)).astype(
        np.float32
    )
    # warmup compile on one window (np.asarray = real value fetch)
    np.asarray(predict(np.zeros((1, window, window, window, 5), np.float32)))
    t0 = time.perf_counter()
    out = sliding_window_predict(
        predict, img, window_size=(window,) * 3, overlap=0.5
    )
    dt = time.perf_counter() - t0
    vox_per_sec = out[..., 0].size / dt
    _line(
        f"sliding_window_inference ({size}^3, window {window}^3, overlap .5)",
        vox_per_sec / 1e6,
        "Mvoxels/sec",
        {"seconds_per_volume": round(dt, 3)},
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    if args.quick:
        bench_train_step(1, 32, 3, features=8, tag="_quickcfg")
        bench_train_step(2, 32, 3, features=8, tag="_optcfg")
    else:
        bench_train_step(1, 128, 5, tag="_quickcfg")  # config 1
        # config 2: high_performance asks for batch 4, which needs ~25GB
        # HBM at 128^3 (BENCH.md); batch 2 + remat is the largest that
        # fits this chip
        bench_train_step(2, 128, 5, tag="_optcfg")
    bench_data_pipeline(args.quick)  # config 3
    bench_sliding_window(args.quick)  # config 5
    # config 4 (CV) is fold-loop orchestration over config-2 steps; its
    # throughput is the same train_step number — no separate device metric.


if __name__ == "__main__":
    main()
