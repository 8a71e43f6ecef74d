#!/usr/bin/env python
"""In-graph A/B of conv lowerings on the SERVING forward (no backward).

The training-path lowering rule (ops/im2col.py::should_use_im2col) is
gated on fwd+bwd train-step A/Bs; serving is a different optimization
problem — no backward, BN folded away — so the candidates differ: the
depth-chunked im2col *forward* beats lax 1.3× isolated at the wide 128³
convs where its backward disqualified it for training, and the thin/
bottleneck matmul forwards win isolated too (BENCH.md round-3 addendum 2
+ per-conv table). Isolated wins routinely invert inside the full XLA
graph, so the production serving rule
(ops/im2col.py::should_use_im2col_serving) is gated on THIS measurement:
the real folded-BN serving forward (infer/fold_bn.py — the exact graph
`predict`/`serve` run) at the flagship 128³ / base-64 configuration.

Timing is device-chained (fori_loop over the forward with a data-dependent
probe feeding the next iteration) so host dispatch and the tunnel's ~6 ms
floor are out of the measurement.

Usage: python tools/ab_serve_forward.py [--size 128] [--features 64]
       [--iters 10] [--variants lax,thin,bneck,trainrule,wide,all]
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


def _rules(size):
    thin = lambda sp, ci, co: ci <= 8
    bneck = lambda sp, ci, co: max(sp) <= 8 and min(ci, co) >= 64
    wide = lambda sp, ci, co: max(sp) >= size and ci > 8
    return {
        "lax": lambda sp, ci, co: False,  # production today
        "thin": thin,
        "bneck": bneck,
        "trainrule": lambda sp, ci, co: thin(sp, ci, co) or bneck(sp, ci, co),
        "wide": wide,
        "all": lambda sp, ci, co: (
            thin(sp, ci, co) or bneck(sp, ci, co) or wide(sp, ci, co)
        ),
    }


def run_variant(variant, size, features, iters, x, folded):
    import pcmseg_tpu.ops.im2col as i2c

    if not hasattr(i2c, "_orig_should_use_im2col_serving"):
        i2c._orig_should_use_im2col_serving = i2c.should_use_im2col_serving
    rules = _rules(size)
    i2c.should_use_im2col_serving = rules[variant]

    from pcmseg_tpu.models import UNet3D

    serve_model = UNet3D(
        n_modalities=5,
        n_classes=1,
        base_features=features,
        norm_layer="none",
        dtype=jnp.bfloat16,
        remat=False,
    )
    apply = lambda xc: serve_model.apply({"params": folded}, xc, train=False)

    @jax.jit
    def many(x):
        def body(i, carry):
            xc, s = carry
            y = apply(xc)
            probe = y.reshape(-1)[0]
            return (
                xc + (probe * 1e-24).astype(xc.dtype),
                s + probe.astype(jnp.float32),
            )

        _, s = jax.lax.fori_loop(0, iters, body, (x, jnp.float32(0.0)))
        return s

    t_c0 = time.perf_counter()
    float(many(x))  # compile + warmup (value fetch = completion barrier)
    compile_s = time.perf_counter() - t_c0
    t0 = time.perf_counter()
    float(many(x))
    dt = (time.perf_counter() - t0) / iters

    logits = np.asarray(jax.jit(apply)(x), np.float32)
    i2c.should_use_im2col_serving = i2c._orig_should_use_im2col_serving
    return {
        "variant": variant,
        "ms_per_vol": round(dt * 1e3, 1),
        "vol_per_s": round(1.0 / dt, 2),
        "compile_s": round(compile_s, 1),
    }, logits


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--features", type=int, default=64)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--variants", default="lax,thin,bneck,trainrule,wide,all")
    args = p.parse_args()

    from pcmseg_tpu.core.config import get_config
    from pcmseg_tpu.infer.fold_bn import fold_batchnorm
    from pcmseg_tpu.models import UNet3D

    config = get_config(
        "standard",
        base_features=args.features,
        target_size=(args.size,) * 3,
        compute_dtype="bfloat16",
    )
    model = UNet3D.from_config(config)
    variables = model.init_variables(jax.random.key(0))
    folded = fold_batchnorm(variables["params"], variables["batch_stats"])

    rng = np.random.default_rng(0)
    x = jax.device_put(
        jnp.asarray(
            rng.normal(size=(1, args.size, args.size, args.size, 5)),
            jnp.bfloat16,
        )
    )

    ref_logits = None
    for variant in args.variants.split(","):
        try:
            row, logits = run_variant(
                variant, args.size, args.features, args.iters, x, folded
            )
            if variant == "lax":
                ref_logits = logits
            elif ref_logits is not None:
                # same math, same bf16 bytes — lowering must be semantics-free
                row["max_abs_diff_vs_lax"] = float(
                    np.abs(logits - ref_logits).max()
                )
        except Exception as e:
            row = {"variant": variant, "error": str(e)[:300]}
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
