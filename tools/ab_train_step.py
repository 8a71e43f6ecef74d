#!/usr/bin/env python
"""End-to-end train-step A/B across conv lowerings on the real chip.

Isolated-op wins routinely invert inside the full XLA graph (BENCH.md),
so every lowering decision is gated on THIS measurement: the full
production train step (fwd + Dice + bwd + clip + Adam + BN) at the
flagship 128^3 / base-64 configuration.

Usage: python tools/ab_train_step.py [--size 128] [--batch 1] [--steps 10]
       [--accum 1] [--variants auto,hybrid,lax]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from pcmseg_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()


def run_variant(lowering, size, batch, steps, accum, remat):
    # selective variants: 'sel<maxsp>' = auto + hybrid at 8 < spatial <= N
    import pcmseg_tpu.ops.hybrid_conv as hc
    import pcmseg_tpu.ops.im2col as i2c

    variant = lowering

    if not hasattr(hc, "_orig_should_use_hybrid"):
        hc._orig_should_use_hybrid = hc.should_use_hybrid
        hc._orig_auto_dw_impl = hc.AUTO_DW_IMPL
    if not hasattr(i2c, "_orig_should_use_im2col"):
        i2c._orig_should_use_im2col = i2c.should_use_im2col
    hc.AUTO_DW_IMPL = hc._orig_auto_dw_impl  # production default unless selp
    i2c.should_use_im2col = i2c._orig_should_use_im2col
    if lowering == "i2cinc":
        # candidate arm (VERDICT r2 weak #1): auto + im2col where Ci <= 8 —
        # the 128^3 5->64 inc conv (isolated: lax 37.4 ms vs im2col 14.0,
        # BENCH.md per-conv table; col buffer ~0.57 GB at 128^3 bf16)
        i2c.should_use_im2col = lambda spatial, cin, cout: (
            i2c._orig_should_use_im2col(spatial, cin, cout) or cin <= 8
        )
        lowering = "auto"
    deep_supervision = False
    if lowering == "ds":
        # production auto lowering + nnU-Net-style deep supervision
        # (models/unet3d.py deep_supervision=True): measures what the three
        # aux heads + multi-scale loss cost the flagship step
        deep_supervision = True
        lowering = "auto"
    if lowering == "i2cwide":
        # candidate arm (round 3): auto + depth-chunked im2col at the wide
        # 128^3 convs (64->64, 128->64) — lax runs them at 15% MFU
        # (BENCH.md per-conv table); the chunked matmul form was previously
        # blocked by the 7-15 GB monolithic col buffer
        # (ops/im2col.py::conv3x3_im2col_chunked, tools/bench_conv_chunked.py)
        i2c.should_use_im2col = lambda spatial, cin, cout: (
            i2c._orig_should_use_im2col(spatial, cin, cout)
            or max(spatial) >= 128
        )
        lowering = "auto"
    if lowering.startswith("selp"):
        # 'selp<N>': auto + hybrid with the PALLAS dW kernel at
        # 8 < spatial <= N (keeps the 128^3 Pallas kernels, which the
        # remote AOT rejects in-model, out of the graph)
        max_sp = int(lowering[4:])
        hc.should_use_hybrid = (
            lambda spatial, cin, cout: 8 < max(spatial) <= max_sp
        )
        hc.AUTO_DW_IMPL = "pallas"
        lowering = "auto"
    elif lowering.startswith("sel"):
        max_sp = int(lowering[3:])
        hc.should_use_hybrid = (
            lambda spatial, cin, cout: 8 < max(spatial) <= max_sp
        )
        lowering = "auto"
    else:
        hc.should_use_hybrid = hc._orig_should_use_hybrid
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
        accum_steps=accum,
        target_size=(size, size, size),
        compute_dtype="bfloat16",
        remat=remat,
        conv_lowering=lowering,
        deep_supervision=deep_supervision,
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
    data = {"image": image, "label": label}

    t_c0 = time.perf_counter()
    state, metrics = step(state, data)
    loss0 = float(metrics["loss"])  # completion barrier
    compile_s = time.perf_counter() - t_c0

    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step(state, data)
    loss = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / steps
    assert np.isfinite(loss)
    return {
        "lowering": variant,
        "ms_per_step": round(dt * 1e3, 1),
        "vol_per_s": round(batch / dt, 3),
        "loss0": round(loss0, 5),
        "compile_s": round(compile_s, 1),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--accum", type=int, default=1)
    p.add_argument("--remat", type=int, default=0)
    p.add_argument("--variants", default="auto,hybrid")
    args = p.parse_args()

    for lowering in args.variants.split(","):
        try:
            row = run_variant(
                lowering, args.size, args.batch, args.steps, args.accum,
                bool(args.remat),
            )
        except Exception as e:
            row = {"lowering": lowering, "error": str(e)[:300]}
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
