#!/usr/bin/env python
"""Split the 3-D conv backward cost: dL/dx vs dL/dW, per model shape.

BENCH.md's round-2 profile shows the train step's gap to the forward's
30.8% MFU is in the conv gradients (backward ~17%).  A conv backward is
two distinct computations with different MXU shapes:

  dx = conv(pad(dy), flip(W)^T)     — conv-shaped, like the forward
  dW = correlate(x, dy)             — a huge-K reduction onto (27*Ci, Co)

This tool times fwd, fwd+dx, fwd+dw, fwd+both for the FLOP-dominant
layers so a hand-written kernel (Pallas) can target the slow half only.

Usage: python tools/bench_conv_grad_split.py
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


from pcmseg_tpu.ops.hybrid_conv import _lax_conv, conv2d_decomp


def lax_conv(x, w):
    # the PRODUCTION conv lowering — imported, not copied, so the
    # measurement always reflects the code that ships
    return _lax_conv(x, w).astype(x.dtype)


def timed(fn, x, w, dyv, iters=8):
    """Chained timing: data-dependency between iters, one D2H at the end.

    All arrays enter as jit ARGUMENTS — closing over them would embed
    them as HLO literals and blow the tunnel's remote-compile request
    size (observed HTTP 413 at 128^3).
    """

    @jax.jit
    def many(x, w, dyv):
        def body(i, carry):
            xc, s = carry
            probe = fn(xc, w, dyv)
            return xc + (probe * 1e-24).astype(xc.dtype), s + probe

        _, s = jax.lax.fori_loop(0, iters, body, (x, jnp.float32(0.0)))
        return s

    float(many(x, w, dyv))
    t0 = time.perf_counter()
    float(many(x, w, dyv))
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    # kept short: each jit is a slow remote AOT compile through the tunnel
    # (the persistent cache makes repeat runs cheap)
    cases = [
        (128, 64, 64),
        (128, 128, 64),   # up4.conv0 (concat in)
        (64, 64, 128),
        (64, 128, 128),
        (64, 256, 128),   # up3.conv0
    ]
    for sp, ci, co in cases:
        x = jnp.asarray(rng.normal(size=(1, sp, sp, sp, ci)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(3, 3, 3, ci, co)) * 0.01, jnp.bfloat16)
        fl = 2 * sp ** 3 * ci * co * 27

        dyv = jnp.asarray(
            rng.normal(size=(1, sp, sp, sp, co)), jnp.bfloat16
        )

        def probe_of(y):
            return y.reshape(-1)[0].astype(jnp.float32)

        def f_fwd(xc, wc, dyc):
            return probe_of(lax_conv(xc, wc))

        # real cotangent: loss contracts the conv with a DATA array so the
        # backward sees a genuine dy (loss=sum would imply dy=ones, which
        # XLA simplifies — measured 6x "wins" that were artifacts)
        def loss(xc, wc, dyc):
            return jnp.sum(lax_conv(xc, wc).astype(jnp.float32) * dyc)

        gx = jax.grad(loss, argnums=0)
        gw = jax.grad(loss, argnums=1)
        gboth = jax.grad(loss, argnums=(0, 1))

        def f_dx(xc, wc, dyc):
            return probe_of(gx(xc, wc, dyc))

        def f_dw(xc, wc, dyc):
            return probe_of(gw(xc, wc, dyc))

        def f_both(xc, wc, dyc):
            dx, dw = gboth(xc, wc, dyc)
            return probe_of(dx) + probe_of(dw)

        from pcmseg_tpu.ops.pallas.conv3d_grad import conv3x3_dw

        def f_pallas_dw(xc, wc, dyc):
            return probe_of(conv3x3_dw(xc, dyc))

        def f_decomp_dw(xc, wc, dyc):
            # dW of the depth-decomposed form, via its AD (what the
            # 'decomp_ad' hybrid backward actually runs)
            _, vjp = jax.vjp(lambda wc2: conv2d_decomp(xc, wc2), wc)
            (dwv,) = vjp(dyc)
            return probe_of(dwv)

        row = {"spatial": sp, "cin": ci, "cout": co}
        for key, f in (
            ("fwd", f_fwd),
            ("fwd_dx", f_dx),
            ("fwd_dw", f_dw),
            ("fwd_dx_dw", f_both),
            ("pallas_dw", f_pallas_dw),
            ("decomp_dw", f_decomp_dw),
        ):
            try:
                t = timed(f, x, w, dyv)
                row[key + "_ms"] = round(t * 1e3, 2)
            except Exception as e:
                row[key + "_ms"] = "FAIL: " + str(e)[:160].replace("\n", " ")
            print(json.dumps(row), flush=True)
        t_f = row.get("fwd_ms")
        if isinstance(t_f, float):
            row["fwd_mfu"] = round(100 * fl / (t_f / 1e3) / PEAK, 1)
            for key in ("fwd_dx", "fwd_dw"):
                t = row.get(key + "_ms")
                if isinstance(t, float):
                    iso = max(t - t_f, 1e-6) / 1e3
                    row[key[4:] + "_iso_ms"] = round(iso * 1e3, 2)
                    row[key[4:] + "_iso_mfu"] = round(100 * fl / iso / PEAK, 1)
            for key in ("pallas_dw", "decomp_dw"):
                t = row.get(key + "_ms")
                if isinstance(t, float):
                    row[key + "_mfu"] = round(100 * fl / (t / 1e3) / PEAK, 1)
        print(json.dumps(row), flush=True)

        # numerics: pallas dw vs AD dw
        try:
            ours = conv3x3_dw(x, dyv)
            ref = jax.grad(
                lambda wc: jnp.sum(
                    lax_conv(x, wc).astype(jnp.float32)
                    * dyv.astype(jnp.float32)
                )
            )(w).astype(jnp.float32)
            print(
                "dw_parity:",
                float(jnp.abs(ours - ref).max()),
                "scale",
                float(jnp.abs(ref).max()),
                flush=True,
            )
        except Exception as e:
            print("dw_parity FAIL:", str(e)[:200], flush=True)


if __name__ == "__main__":
    main()
