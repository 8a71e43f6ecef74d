#!/usr/bin/env python
"""A/B: native 3-D conv vs depth-decomposed sum-of-3 2-D convs.

Hypothesis: XLA:TPU's 2-D spatial conv emitter (the bread-and-butter path
for image models) is better tuned than the 3-D one at this model's
full-resolution shapes (128^3/64^3 with 64-128 channels, where BENCH.md
measured 15-27% fwd+bwd MFU).  A SAME 3x3x3 conv decomposes exactly as

    y = sum_{a in 0..2} conv2d(shift_D(x, a-1), w[a])

with (N*D) folded into the conv2d batch — three well-tiled 2-D convs, and
the backward differentiates through conv2d gradients instead of 3-D ones.

Usage: python tools/bench_conv2d_decomp.py
"""

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


from pcmseg_tpu.ops.hybrid_conv import _lax_conv, conv2d_decomp as _decomp


def lax_conv(x, w):
    # PRODUCTION lowerings imported (not copied) so the A/B always
    # measures the code that ships
    return _lax_conv(x, w).astype(x.dtype)


def conv2d_decomp(x, w):
    return _decomp(x, w).astype(x.dtype)


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


def timed_chained_grad(fn, x, w, dy, iters=8):
    """fwd+bwd with a REAL cotangent: loss = sum(fn(x,w) * dy).

    dy must be a data array (not implied ones) or XLA simplifies the
    backward; both dx and dw are probed so neither half is DCE'd. All
    arrays enter as jit arguments (closure constants become HLO literals
    and blow the tunnel's remote-compile request size).
    """

    def loss(x, w, dy):
        return jnp.sum(fn(x, w).astype(jnp.float32) * dy)

    g = jax.grad(loss, argnums=(0, 1))

    @jax.jit
    def many(x, w, dy):
        def body(i, carry):
            xc, s = carry
            dx, dw = g(xc, w, dy)
            probe = (
                dx.reshape(-1)[0].astype(jnp.float32)
                + dw.reshape(-1)[0].astype(jnp.float32)
            )
            return (
                xc + (probe * 1e-24).astype(xc.dtype),
                s + probe,
            )

        _, s = jax.lax.fori_loop(0, iters, body, (x, jnp.float32(0.0)))
        return s

    float(many(x, w, dy))
    t0 = time.perf_counter()
    float(many(x, w, dy))
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    # the FLOP-dominant full-res / mid layers (batch 1). Kept short: each
    # jit is a multi-minute remote AOT compile through the axon tunnel.
    cases = [
        (128, 64, 64),
        (64, 64, 128),
        (64, 128, 128),
        (32, 128, 256),
    ]
    for sp, ci, co in cases:
        x = jnp.asarray(rng.normal(size=(1, sp, sp, sp, ci)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(3, 3, 3, ci, co)) * 0.01, jnp.bfloat16)
        fl = 2 * sp ** 3 * ci * co * 27
        dy = jnp.asarray(rng.normal(size=(1, sp, sp, sp, co)), jnp.bfloat16)
        row = {"spatial": sp, "cin": ci, "cout": co}
        for key, fn, timer, mult in (
            ("fwd_3d", lax_conv, timed_chained, 1),
            ("fwd_2d", conv2d_decomp, timed_chained, 1),
            ("fwdbwd_3d", lax_conv, timed_chained_grad, 3),
            ("fwdbwd_2d", conv2d_decomp, timed_chained_grad, 3),
        ):
            try:
                t = (
                    timer(fn, x, w)
                    if timer is timed_chained
                    else timer(fn, x, w, dy)
                )
                row[key + "_ms"] = round(t * 1e3, 2)
                row[key + "_mfu"] = round(100 * mult * fl / t / PEAK, 1)
            except Exception as e:
                row[key + "_ms"] = "FAIL: " + str(e)[:200].replace("\n", " ")
            print(json.dumps(row), flush=True)

    ya = lax_conv(x, w).astype(jnp.float32)
    yb = conv2d_decomp(x, w).astype(jnp.float32)
    print("max_abs_diff:", float(jnp.abs(ya - yb).max()))


if __name__ == "__main__":
    main()
