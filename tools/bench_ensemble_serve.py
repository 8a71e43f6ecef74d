#!/usr/bin/env python
"""On-chip cost of fold-ensemble serving (infer/predict.py ensemble path).

Times the exact vmapped fold-mean forward the ensemble Predictor compiles
(stacked folded params, mean of sigmoids) against the single-model serving
forward, at the flagship 128³/base-64 shape. Device-chained timing
(fori_loop; no dispatch floor).

Usage: python tools/bench_ensemble_serve.py [--size 128] [--features 64]
       [--folds 2,3] [--iters 10]
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--features", type=int, default=64)
    p.add_argument("--folds", default="2,3")
    p.add_argument("--iters", type=int, default=10)
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
    serve_model = UNet3D(
        n_modalities=5, n_classes=1, base_features=args.features,
        norm_layer="none", dtype=jnp.bfloat16, remat=False,
    )

    def folded_params(seed):
        v = model.init_variables(jax.random.key(seed))
        return fold_batchnorm(v["params"], v["batch_stats"])

    base_apply = lambda vars_, x: serve_model.apply(
        vars_, x, method=UNet3D.predict
    )

    def timed(apply, variables, x):
        @jax.jit
        def many(v, x):
            def body(i, carry):
                xc, s = carry
                y = apply(v, xc)
                probe = y.reshape(-1)[0]
                return (
                    xc + (probe * 1e-24).astype(xc.dtype),
                    s + probe.astype(jnp.float32),
                )

            _, s = jax.lax.fori_loop(0, args.iters, body, (x, jnp.float32(0)))
            return s

        t_c0 = time.perf_counter()
        float(many(variables, x))
        compile_s = time.perf_counter() - t_c0
        t0 = time.perf_counter()
        float(many(variables, x))
        return (time.perf_counter() - t0) / args.iters, compile_s

    rng = np.random.default_rng(0)
    x = jax.device_put(
        jnp.asarray(
            rng.normal(size=(1, args.size, args.size, args.size, 5)),
            jnp.bfloat16,
        )
    )

    single = jax.device_put({"params": folded_params(0)})
    dt, cs = timed(base_apply, single, x)
    print(json.dumps({
        "folds": 1, "ms_per_vol": round(dt * 1e3, 1), "compile_s": round(cs, 1)
    }), flush=True)

    def vmap_apply(vars_, xc):
        return jnp.mean(jax.vmap(lambda v: base_apply(v, xc))(vars_), axis=0)

    def unroll_apply(vars_, xc):
        k = jax.tree.leaves(vars_)[0].shape[0]
        probs = [
            base_apply(jax.tree.map(lambda a, i=i: a[i], vars_), xc)
            for i in range(k)
        ]
        return sum(probs) / k

    def scan_apply(vars_, xc):
        k = jax.tree.leaves(vars_)[0].shape[0]
        init = jnp.zeros((*xc.shape[:-1], 1), jnp.float32)

        def body(acc, v):
            return acc + base_apply(v, xc), None

        total, _ = jax.lax.scan(body, init, vars_)
        return total / k

    forms = {"vmap": vmap_apply, "unroll": unroll_apply, "scan": scan_apply}

    for k in (int(v) for v in args.folds.split(",")):
        var_list = [{"params": folded_params(i)} for i in range(k)]
        stacked = jax.device_put(
            jax.tree.map(
                lambda *xs: np.stack([np.asarray(a) for a in xs]), *var_list
            )
        )
        for name, ens_apply in forms.items():
            try:
                dt_k, cs_k = timed(ens_apply, stacked, x)
                row = {
                    "folds": k,
                    "form": name,
                    "ms_per_vol": round(dt_k * 1e3, 1),
                    "compile_s": round(cs_k, 1),
                    "x_single": round(dt_k / dt, 2),
                }
            except Exception as e:
                row = {"folds": k, "form": name, "error": str(e)[:200]}
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
