#!/usr/bin/env python
"""Where does the 128³ train step's time go? (VERDICT round-1 item #3)

Three measurements on the real chip:
  1. XLA cost analysis of the jitted train step → exact FLOP count, and
     with the measured wall time an exact MFU figure (no estimates).
  2. Fwd-only vs fwd+bwd vs full-step wall times.
  3. Per-shape conv/convT microbenchmarks covering every distinct
     (spatial, Cin, Cout) conv in the model, each vs its own roofline —
     pinpoints which layers run below peak.

All timings end on a device-to-host scalar fetch (the tunneled backend
acks block_until_ready early — see BENCH.md).

Usage: python tools/profile_train_step.py [--size 128] [--batch 1] [--steps 5]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

PEAK_BF16_TFLOPS = 197.0  # TPU v5e


def fetch_barrier(x):
    """True completion barrier: a device-to-host scalar fetch."""
    return float(jnp.sum(x.astype(jnp.float32)) if hasattr(x, "astype") else x)


def timed(fn, *args, steps=5):
    out = fn(*args)
    jax.tree.map(lambda a: fetch_barrier(a), out)  # warmup + compile
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    leaves = [a for a in jax.tree.leaves(out) if hasattr(a, "dtype")]
    fetch_barrier(leaves[-1])
    return (time.perf_counter() - t0) / steps, out


def timed_chained(op, x, w, iters=20):
    """Time a small op with iterations CHAINED inside one jit.

    A Python-side dispatch loop under-measures ops smaller than the
    per-call overhead of the tunneled backend (~5-10 ms floor). Here each
    iteration's output perturbs the next iteration's input by an
    epsilon-scaled scalar, forcing a serial dependence (no hoisting, no
    overlap), so one dispatch executes `iters` real ops back to back.
    """
    import jax.numpy as jnp

    @jax.jit
    def many(x, w):
        def body(i, carry):
            xc, s = carry
            y = op(xc, w)
            probe = y.reshape(-1)[0]
            return (
                xc + (probe * 1e-24).astype(xc.dtype),
                s + probe.astype(jnp.float32),
            )

        _, s = jax.lax.fori_loop(0, iters, body, (x, jnp.float32(0.0)))
        return s

    fetch_barrier(many(x, w))  # warmup + compile
    t0 = time.perf_counter()
    fetch_barrier(many(x, w))
    return (time.perf_counter() - t0) / iters


def conv_flops(spatial, cin, cout, k=3):
    vox = spatial ** 3
    return 2 * vox * cin * cout * (k ** 3)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--skip_micro", action="store_true")
    ap.add_argument("--out", default=None, help="also write the JSON here")
    args = ap.parse_args()

    from pcmseg_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    from pcmseg_tpu.core.config import get_config
    from pcmseg_tpu.models import UNet3D
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
    image = jax.device_put(
        rng.normal(size=(batch, size, size, size, 5)).astype(np.float32)
    )
    label = jax.device_put(
        (rng.random((batch, size, size, size, 1)) > 0.9).astype(np.float32)
    )
    batch_data = {"image": image, "label": label}

    report = {"size": size, "batch": batch, "backend": jax.default_backend()}

    # ---- 1. exact FLOPs via XLA cost analysis -------------------------------
    step = jax.jit(make_train_step(model, config))
    lowered = step.lower(state, batch_data)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    step_flops = float(cost.get("flops", float("nan")))
    report["step_flops_T"] = round(step_flops / 1e12, 3)

    # ---- 2. phase wall times -------------------------------------------------
    step_j = jit_train_step(make_train_step(model, config), donate=False)

    def run_step(s, b):
        new_s, m = step_j(s, b)
        return m["loss"]

    t_step, _ = timed(lambda: run_step(state, batch_data), steps=args.steps)
    report["train_step_ms"] = round(t_step * 1e3, 2)
    report["train_step_mfu_pct"] = round(
        100 * step_flops / t_step / (PEAK_BF16_TFLOPS * 1e12), 2
    )
    report["volumes_per_sec"] = round(batch / t_step, 3)

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    fwd_c = jax.jit(lambda v, x: model.apply(v, x, train=False)).lower(
        variables, image
    ).compile()
    fwd_cost = fwd_c.cost_analysis()
    fwd_cost = fwd_cost[0] if isinstance(fwd_cost, (list, tuple)) else fwd_cost
    fwd_flops = float(fwd_cost.get("flops", float("nan")))
    t_fwd, _ = timed(lambda: fwd(variables, image), steps=args.steps)
    report["fwd_ms"] = round(t_fwd * 1e3, 2)
    report["fwd_flops_T"] = round(fwd_flops / 1e12, 3)
    report["fwd_mfu_pct"] = round(
        100 * fwd_flops / t_fwd / (PEAK_BF16_TFLOPS * 1e12), 2
    )

    # ---- 3. per-shape conv microbench ---------------------------------------
    if not args.skip_micro:
        shapes = []
        f = config.base_features
        s = size
        shapes.append(("inc.conv0", s, 5, f, 3))
        shapes.append(("inc.conv1/up4.conv1", s, f, f, 3))
        shapes.append(("up4.conv0(cat)", s, 2 * f, f, 3))
        for lvl in range(1, 5):
            sp = size // (2 ** lvl)
            cin, cout = f * 2 ** (lvl - 1), f * 2 ** lvl
            shapes.append((f"down{lvl}.conv0", sp, cin, cout, 3))
            shapes.append((f"down{lvl}.conv1", sp, cout, cout, 3))
            if lvl < 4:
                shapes.append((f"up{4 - lvl}.conv0(cat)", sp, 2 * cout, cout, 3))
        micro = []
        for name, sp, cin, cout, k in shapes:
            x = jnp.asarray(
                rng.normal(size=(batch, sp, sp, sp, cin)), jnp.bfloat16
            )
            w = jnp.asarray(
                rng.normal(size=(k, k, k, cin, cout)) * 0.01, jnp.bfloat16
            )

            def conv(x, w):
                return jax.lax.conv_general_dilated(
                    x, w, (1, 1, 1), "SAME",
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                )

            t = timed_chained(conv, x, w, iters=20)
            fl = batch * conv_flops(sp, cin, cout, k)
            micro.append(
                {
                    "conv": name,
                    "spatial": sp,
                    "cin": cin,
                    "cout": cout,
                    "ms": round(t * 1e3, 3),
                    "tflops": round(fl / t / 1e12, 1),
                    "mfu_pct": round(100 * fl / t / (PEAK_BF16_TFLOPS * 1e12), 1),
                }
            )
        # transposed convs (decoder upsampling)
        for lvl in range(1, 5):
            sp = size // (2 ** (5 - lvl))
            cin = f * 2 ** (5 - lvl)
            cout = cin // 2
            x = jnp.asarray(
                rng.normal(size=(batch, sp, sp, sp, cin)), jnp.bfloat16
            )
            w = jnp.asarray(
                rng.normal(size=(2, 2, 2, cin, cout)) * 0.01, jnp.bfloat16
            )

            def convt(x, w):
                return jax.lax.conv_transpose(
                    x, w, (2, 2, 2), "VALID",
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                )

            t = timed_chained(convt, x, w, iters=20)
            fl = batch * 2 * (sp ** 3) * cin * cout * 8
            micro.append(
                {
                    "conv": f"up{lvl}.up(convT)",
                    "spatial": sp,
                    "cin": cin,
                    "cout": cout,
                    "ms": round(t * 1e3, 3),
                    "tflops": round(fl / t / 1e12, 1),
                    "mfu_pct": round(100 * fl / t / (PEAK_BF16_TFLOPS * 1e12), 1),
                }
            )
        report["micro"] = micro
        fwd_conv_ms = sum(m["ms"] for m in micro)
        report["sum_fwd_conv_ms"] = round(fwd_conv_ms, 1)

    print(json.dumps(report, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
