#!/usr/bin/env python
"""Compare conv lowerings (fwd and fwd+bwd) at the U-Net's deep shapes.

The round-2 profile (BENCH.md) shows XLA's conv at spatial 8/16 with wide
channels running at 5-17%% MFU. With tiny spatial extents an im2col matmul
is cheap to materialize (≤113 MB of patches) and tiles straight onto the
MXU — and its weight-gradient becomes a plain, well-tiled matmul too.

Usage: python tools/bench_conv_impls.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

PEAK = 197e12


def im2col_conv(x, w, b=None):
    """The PRODUCTION im2col lowering (ops/im2col.py) — imported, not a
    copy, so BENCH.md's decision-rule numbers always reflect the code
    that ships (incl. its memory-safe custom VJP on the grad path)."""
    from pcmseg_tpu.ops.im2col import conv3x3_im2col

    y = conv3x3_im2col(x, w)
    if b is not None:
        y = y + b
    return y.astype(x.dtype)


def lax_conv(x, w, b=None):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), ((1, 1), (1, 1), (1, 1)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    if b is not None:
        y = y + b
    return y.astype(x.dtype)


def timed_chained(fn, x, w, iters=20):
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


def timed_chained_grad(fn, x, w, iters=10):
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
    rng = np.random.default_rng(0)
    results = []
    # the model's deep/mid shapes (batch 1)
    cases = [
        (8, 512, 1024),
        (8, 1024, 1024),
        (16, 256, 512),
        (16, 512, 512),
        (16, 1024, 512),
        (32, 128, 256),
        (32, 256, 256),
        (32, 512, 256),
    ]
    for sp, ci, co in cases:
        x = jnp.asarray(rng.normal(size=(1, sp, sp, sp, ci)), jnp.bfloat16)
        w = jnp.asarray(
            rng.normal(size=(3, 3, 3, ci, co)) * 0.01, jnp.bfloat16
        )
        fl = 2 * sp ** 3 * ci * co * 27
        row = {"spatial": sp, "cin": ci, "cout": co}
        t_lax = timed_chained(lax_conv, x, w)
        t_i2c = timed_chained(im2col_conv, x, w)
        row["fwd_lax_ms"] = round(t_lax * 1e3, 3)
        row["fwd_i2c_ms"] = round(t_i2c * 1e3, 3)
        row["fwd_lax_mfu"] = round(100 * fl / t_lax / PEAK, 1)
        row["fwd_i2c_mfu"] = round(100 * fl / t_i2c / PEAK, 1)
        tg_lax = timed_chained_grad(lax_conv, x, w)
        tg_i2c = timed_chained_grad(im2col_conv, x, w)
        row["fwdbwd_lax_ms"] = round(tg_lax * 1e3, 3)
        row["fwdbwd_i2c_ms"] = round(tg_i2c * 1e3, 3)
        row["fwdbwd_lax_mfu"] = round(100 * 3 * fl / tg_lax / PEAK, 1)
        row["fwdbwd_i2c_mfu"] = round(100 * 3 * fl / tg_i2c / PEAK, 1)
        results.append(row)
        print(json.dumps(row), flush=True)

    # numerics check on the last case
    ya = lax_conv(x, w)
    yb = im2col_conv(x, w)
    print(
        "max_abs_diff:",
        float(jnp.abs(ya.astype(jnp.float32) - yb.astype(jnp.float32)).max()),
    )


if __name__ == "__main__":
    main()
