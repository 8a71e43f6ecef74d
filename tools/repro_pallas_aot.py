#!/usr/bin/env python
"""Minimal reproducer for the Pallas-dW in-graph AOT compile failure.

BENCH.md (rounds 2-4) records that the hand-written Pallas dW kernel
(ops/pallas/conv3d_grad.py — 15-31% MFU isolated vs XLA's 4% on the
same shapes) compiles STANDALONE at every model shape but is rejected
by the remote TPU's AOT compile once embedded in the full train-step
graph (`conv_lowering='hybrid_pallas'` / the `selp64` arm). That claim
gated real headroom on a toolchain fix, but no error text or versions
were ever recorded (VERDICT round-4 weak #6 / next #8). This script is
the durable record: it walks a ladder from standalone kernel to
in-model train step and emits one JSON with each rung's outcome, the
EXACT error text, and the toolchain versions — so the day jax/libtpu
moves, `python tools/repro_pallas_aot.py` says whether the 15-31%-MFU
dW headroom is unlocked.

Rungs:
  1. standalone dW kernel fwd (expected: OK everywhere)
  2. jitted value_and_grad of the custom-VJP hybrid conv, 64^3x64
     (expected: OK — this is the kernel + its VJP outside the model)
  3. UNet3D train step, 32^3 base-8, conv_lowering='hybrid_pallas'
  4. UNet3D train step, 64^3 base-32, conv_lowering='hybrid_pallas'
     (the smallest config BENCH.md round-2 recorded as failing)

Usage: python tools/repro_pallas_aot.py [--out repro_pallas_aot.json]
"""

import argparse
import json
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def versions() -> dict:
    import jax
    import jaxlib

    v = {
        "jax": jax.__version__,
        "jaxlib": jaxlib.__version__,
        "backend": jax.default_backend(),
        "devices": [str(d) for d in jax.devices()],
    }
    try:
        import libtpu

        v["libtpu"] = getattr(libtpu, "__version__", "unknown")
    except Exception:
        v["libtpu"] = None
    return v


def _attempt(fn) -> dict:
    """Run one rung; capture success or the exact failure text."""
    try:
        fn()
        return {"ok": True}
    except Exception as e:  # noqa: BLE001 — the error text IS the artifact
        return {
            "ok": False,
            "error_type": type(e).__name__,
            "error": str(e)[:4000],
            "traceback_tail": traceback.format_exc()[-2000:],
        }


def rung1_standalone_kernel():
    import jax.numpy as jnp

    from pcmseg_tpu.ops.pallas.conv3d_grad import conv3x3_dw

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 64, 64)), jnp.float32)
    dy = jnp.asarray(rng.normal(size=(1, 64, 64, 64, 64)), jnp.float32)
    out = conv3x3_dw(x, dy)
    out.block_until_ready()


def rung2_hybrid_conv_grad():
    import jax
    import jax.numpy as jnp

    from pcmseg_tpu.ops.hybrid_conv import conv3x3_hybrid

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 64, 64)), jnp.float32)
    w = jnp.asarray(
        rng.normal(size=(3, 3, 3, 64, 64)) * 0.05, jnp.float32
    )

    @jax.jit
    def loss_and_grad(x, w):
        def loss(w):
            return jnp.mean(conv3x3_hybrid(x, w, dw_impl="pallas") ** 2)

        return jax.value_and_grad(loss)(w)

    val, g = loss_and_grad(x, w)
    jax.block_until_ready((val, g))


def _train_step_rung(size: int, base: int):
    def run():
        import jax

        from pcmseg_tpu.core.config import get_config
        from pcmseg_tpu.models.unet3d import UNet3D
        from pcmseg_tpu.train.steps import create_train_state, make_train_step

        cfg = get_config(
            "quick",
            data_dir="/tmp",
            target_size=(size,) * 3,
            base_features=base,
            batch_size=1,
            conv_lowering="hybrid_pallas",
            remat=True,
            validation=False,
        )
        model = UNet3D.from_config(cfg)
        state = create_train_state(
            cfg, jax.random.key(0), model, (1, size, size, size, 5)
        )
        step = jax.jit(make_train_step(model, cfg))
        rng = np.random.default_rng(2)
        batch = {
            "image": rng.normal(size=(1, size, size, size, 5)).astype(
                np.float32
            ),
            "label": (rng.random((1, size, size, size, 1)) > 0.7).astype(
                np.float32
            ),
            "weight": np.ones((1,), np.float32),
        }
        state, metrics = step(state, batch)
        jax.block_until_ready(metrics)

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--out",
        default=os.path.join(os.path.dirname(__file__), "repro_pallas_aot.json"),
    )
    ap.add_argument("--skip_large", action="store_true",
                    help="skip rung 4 (64^3 base-32 — several GB of HBM)")
    args = ap.parse_args()

    report = {"versions": versions(), "rungs": {}}
    rungs = [
        ("1_standalone_dw_kernel_64^3x64", rung1_standalone_kernel),
        ("2_hybrid_conv_value_and_grad_64^3x64", rung2_hybrid_conv_grad),
        ("3_unet_train_step_32^3_base8_hybrid_pallas",
         _train_step_rung(32, 8)),
    ]
    if not args.skip_large:
        rungs.append(
            ("4_unet_train_step_64^3_base32_hybrid_pallas",
             _train_step_rung(64, 32))
        )
    for name, fn in rungs:
        print(f"--- {name}", flush=True)
        report["rungs"][name] = _attempt(fn)
        print(json.dumps(report["rungs"][name])[:500], flush=True)

    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {args.out}")
    # exit 0 either way: the artifact is the record, not a gate
    return 0


if __name__ == "__main__":
    sys.exit(main())
