#!/usr/bin/env python
"""In-step benchmark: fused Pallas dice vs jnp dice (VERDICT round-1 #5).

The fused kernel (ops/pallas/dice.py) streams logits/targets through VMEM
once with a custom VJP; this tool times the FULL jitted train step with
each loss on the real chip to decide wire-or-delete. The loss is a tiny
fraction of the step (three reductions over ~8 MB vs ~5 TFLOP of conv), so
any win must show up end-to-end to justify a production path.

Usage: python tools/bench_pallas_dice.py [--size 128] [--batch 1] [--steps 10]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def run(step, state, batch, steps):
    new_state, m = step(state, batch)
    float(m["loss"])  # compile + completion barrier
    t0 = time.perf_counter()
    s = state
    for _ in range(steps):
        s, m = step(s, batch)
    loss = float(m["loss"])
    dt = (time.perf_counter() - t0) / steps
    return dt, loss


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args()

    from pcmseg_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    from pcmseg_tpu.core.config import get_config
    from pcmseg_tpu.models import UNet3D
    from pcmseg_tpu.ops.pallas.dice import fused_dice_loss
    from pcmseg_tpu.train.steps import (
        create_train_state,
        jit_train_step,
        make_train_step,
    )

    size, batch = args.size, args.batch
    config = get_config(
        "standard",
        batch_size=batch,
        target_size=(size, size, size),
        compute_dtype="bfloat16",
        remat=False,
    )
    model = UNet3D.from_config(config)
    state = create_train_state(
        config, jax.random.key(0), model, (batch, size, size, size, 5)
    )
    rng = np.random.default_rng(0)
    batch_data = {
        "image": jax.device_put(
            rng.normal(size=(batch, size, size, size, 5)).astype(np.float32)
        ),
        "label": jax.device_put(
            (rng.random((batch, size, size, size, 1)) > 0.9).astype(np.float32)
        ),
    }

    step_jnp = jit_train_step(make_train_step(model, config), donate=False)

    def pallas_loss(logits, targets, weight=None):
        assert weight is None, "bench path is unweighted"
        return fused_dice_loss(logits, targets, config.dice_smooth)

    step_pallas = jit_train_step(
        make_train_step(model, config, loss_fn=pallas_loss), donate=False
    )

    t_jnp, l_jnp = run(step_jnp, state, batch_data, args.steps)
    t_pal, l_pal = run(step_pallas, state, batch_data, args.steps)

    print(
        json.dumps(
            {
                "size": size,
                "batch": batch,
                "jnp_ms": round(t_jnp * 1e3, 2),
                "pallas_ms": round(t_pal * 1e3, 2),
                "speedup": round(t_jnp / t_pal, 4),
                "loss_jnp": round(l_jnp, 6),
                "loss_pallas": round(l_pal, 6),
                "loss_abs_diff": round(abs(l_jnp - l_pal), 8),
            },
            indent=2,
        )
    )


if __name__ == "__main__":
    main()
