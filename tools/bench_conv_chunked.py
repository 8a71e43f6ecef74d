#!/usr/bin/env python
"""Isolated A/B: lax conv vs depth-chunked im2col at the WIDE 128^3 shapes.

The round-2 per-conv table (BENCH.md) skipped im2col at 128^3 x 64->64
because the monolithic col buffer is ~7 GB. The depth-chunked lowering
(ops/im2col.py::conv3x3_im2col_chunked) materializes one depth slab at a
time, making the matmul form affordable exactly where lax runs at 15% MFU.
This measures fwd and fwd+bwd per chunk size; an in-model verdict (the one
that counts — isolated wins routinely invert, BENCH.md) comes from
tools/ab_train_step.py --variants auto,i2cwide.

Usage: python tools/bench_conv_chunked.py [--cases ...]
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

from pcmseg_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()

PEAK = 197e12


def lax_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), ((1, 1), (1, 1), (1, 1)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


def timed_chained(fn, x, w, iters=10):
    @jax.jit
    def many(x, w):
        def body(i, carry):
            xc, s = carry
            y = fn(xc, w)
            probe = y.reshape(-1)[0]
            return (
                xc + (probe * 1e-24).astype(xc.dtype),
                s + probe.astype(jnp.float32),
            )

        _, s = jax.lax.fori_loop(0, iters, body, (x, jnp.float32(0.0)))
        return s

    float(many(x, w))
    t0 = time.perf_counter()
    float(many(x, w))
    return (time.perf_counter() - t0) / iters


def timed_chained_grad(fn, x, w, iters=6):
    def loss(x, w):
        return fn(x, w).astype(jnp.float32).sum()

    g = jax.grad(loss, argnums=(0, 1))

    @jax.jit
    def many(x, w):
        def body(i, carry):
            xc, wc, s = carry
            dx, dw = g(xc, wc)
            probe = dw.reshape(-1)[0]
            return (
                xc + (probe * 1e-24).astype(xc.dtype),
                wc,
                s + probe.astype(jnp.float32),
            )

        _, _, s = jax.lax.fori_loop(0, iters, body, (x, w, jnp.float32(0.0)))
        return s

    float(many(x, w))
    t0 = time.perf_counter()
    float(many(x, w))
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--chunks", default="8,16,32")
    p.add_argument(
        "--cases", default="128:64:64,128:128:64,64:64:128",
        help="spatial:cin:cout, comma-separated",
    )
    args = p.parse_args()
    from pcmseg_tpu.ops.im2col import conv3x3_im2col_chunked

    rng = np.random.default_rng(0)
    chunks = [int(c) for c in args.chunks.split(",")]
    for case in args.cases.split(","):
        sp, ci, co = (int(v) for v in case.split(":"))
        x = jnp.asarray(rng.normal(size=(1, sp, sp, sp, ci)), jnp.bfloat16)
        w = jnp.asarray(
            rng.normal(size=(3, 3, 3, ci, co)) * 0.01, jnp.bfloat16
        )
        fl = 2 * sp ** 3 * ci * co * 27
        row = {"spatial": sp, "cin": ci, "cout": co}
        try:
            t = timed_chained(lax_conv, x, w)
            row["fwd_lax_ms"] = round(t * 1e3, 2)
            tg = timed_chained_grad(lax_conv, x, w)
            row["fwdbwd_lax_ms"] = round(tg * 1e3, 2)
            row["fwdbwd_lax_mfu"] = round(100 * 3 * fl / tg / PEAK, 1)
        except Exception as e:
            # the known isolated-compile pathology: XLA's dW at wide 128^3
            # shapes picks a layout whose copy would allocate 32 GB
            # (BENCH.md round-2 "dW alone: isolated compile fails")
            row["lax_error"] = str(e)[:160]
        for c in chunks:
            fn = lambda x, w, c=c: conv3x3_im2col_chunked(x, w, c)
            try:
                t = timed_chained(fn, x, w)
                row[f"fwd_chunk{c}_ms"] = round(t * 1e3, 2)
                tg = timed_chained_grad(fn, x, w)
                row[f"fwdbwd_chunk{c}_ms"] = round(tg * 1e3, 2)
                row[f"fwdbwd_chunk{c}_mfu"] = round(
                    100 * 3 * fl / tg / PEAK, 1
                )
            except Exception as e:
                row[f"chunk{c}_error"] = str(e)[:160]
        print(json.dumps(row), flush=True)

    # numerics: bf16 fwd must match lax bitwise (same per-voxel dot)
    ya = lax_conv(x, w).astype(jnp.float32)
    yb = conv3x3_im2col_chunked(x, w, chunks[0]).astype(jnp.float32)
    print("max_abs_diff:", float(jnp.abs(ya - yb).max()))


if __name__ == "__main__":
    main()
