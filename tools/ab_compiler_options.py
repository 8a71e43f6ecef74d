#!/usr/bin/env python
"""A/B TPU compiler options on the full train step via lower().compile().

TPU-only XLA flags CANNOT go through XLA_FLAGS here: the client-side
(CPU-build) flag parser aborts on unknown flags (parse_flags_from_env
F-check). Per-compile `compiler_options` ARE accepted and forwarded by
the tunnel's remote compiler, so this harness is the way to sweep them.

Usage:
  python tools/ab_compiler_options.py                       # baseline
  python tools/ab_compiler_options.py '{"xla_tpu_scoped_vmem_limit_kib": "65536"}'

Measured (round 2, 128^3 base-64 bf16 step, batch 1, no remat):
  baseline ~287 ms; scoped_vmem 64 MiB -> 289.1 ms (no win; the step's
  ceiling is XLA's conv-gradient algorithm, not VMEM scoping).
Note: non-default options change the compile-cache key (~190 s cold).
"""

import json
import sys
import time

import jax
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pcmseg_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()

from pcmseg_tpu.core.config import get_config
from pcmseg_tpu.models import UNet3D
from pcmseg_tpu.train.steps import create_train_state, make_train_step


def main():
    opts = json.loads(sys.argv[1]) if len(sys.argv) > 1 else None
    size, batch, steps = 128, 1, 10
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
    data = {
        "image": jax.device_put(
            rng.normal(size=(batch, size, size, size, 5)).astype(np.float32)
        ),
        "label": jax.device_put(
            (rng.random((batch, size, size, size, 1)) > 0.9).astype(np.float32)
        ),
    }
    t0 = time.perf_counter()
    lowered = jax.jit(make_train_step(model, config), donate_argnums=(0,)).lower(
        state, data
    )
    compiled = (
        lowered.compile(compiler_options=opts) if opts else lowered.compile()
    )
    compile_s = round(time.perf_counter() - t0, 1)
    state, m = compiled(state, data)
    float(m["loss"])  # completion barrier
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = compiled(state, data)
    loss = float(m["loss"])
    dt = (time.perf_counter() - t0) / steps
    assert np.isfinite(loss)
    print(
        json.dumps(
            {
                "opts": opts,
                "ms_per_step": round(dt * 1e3, 1),
                "compile_s": compile_s,
                "loss": round(loss, 5),
            }
        )
    )


if __name__ == "__main__":
    main()
