#!/usr/bin/env python
"""On-chip step-time sweep for patch (crop) training — VERDICT round-3 #1.

``--train_crop`` shipped in round 3 with correctness tests but no
measurements. This closes the loop: the REAL cached train step
(device-resident 128^3 stacks, on-device ``device_random_crop`` inside
the jitted step — data/device_cache.py) is timed at the flagship
full-volume config and at 112^3 / 96^3 / 64^3 crops, with
batch-compensated arms holding voxels-per-optimizer-update roughly
constant where HBM allows. Also measures the marginal cost of
foreground oversampling (masked-argmax over the full label volume,
ADVICE round-3 #3) and of on-device augmentation at crop scale.

Reported per arm: median steady step time, crops/s, raw voxel
throughput, and the 128^3-volume-equivalent rate (voxels/s divided by
128^3) — the number comparable to bench.py's 3.74 vol/s/chip headline.

Usage: python tools/bench_train_crop.py [--steps 10] [--cases 8]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from pcmseg_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()


def make_stacks(n_cases: int, size: int, n_mod: int):
    """Synthetic HBM-resident stacks: bf16 images + uint8 sphere labels
    (foreground present so oversample_fg exercises its real path)."""
    import ml_dtypes

    rng = np.random.default_rng(0)
    images = rng.normal(size=(n_cases, size, size, size, n_mod)).astype(
        ml_dtypes.bfloat16
    )
    coords = np.arange(size) - size / 2
    zz, yy, xx = np.meshgrid(coords, coords, coords, indexing="ij")
    labels = np.zeros((n_cases, size, size, size, 1), np.uint8)
    for i in range(n_cases):
        cz, cy, cx = rng.uniform(-size / 4, size / 4, 3)
        r = rng.uniform(size / 10, size / 5)
        sphere = ((zz - cz) ** 2 + (yy - cy) ** 2 + (xx - cx) ** 2) < r * r
        labels[i, ..., 0] = sphere.astype(np.uint8)
    return images, labels


def run_arm(images, labels, *, crop, batch, accum, oversample, augment,
            remat, steps, size, strong_aug=False):
    import jax
    import jax.numpy as jnp

    from pcmseg_tpu.core.config import get_config
    from pcmseg_tpu.data.device_cache import make_cached_train_step
    from pcmseg_tpu.models import UNet3D
    from pcmseg_tpu.train.steps import create_train_state, make_train_step

    config = get_config(
        "high_performance",
        batch_size=batch,
        accum_steps=accum,
        remat=remat,
        target_size=(size,) * 3,
        train_crop=(crop,) * 3 if crop else None,
        oversample_fg=oversample,
        data_augmentation=augment,
        # extended nnU-Net-style device augs (warp/gamma/noise/blur):
        # measures the affine-warp gather cost inside the real step
        **(
            dict(aug_scale=0.15, aug_rotate_deg=20.0, aug_gamma=0.3,
                 aug_noise=0.1, aug_blur_prob=0.2)
            if strong_aug else {}
        ),
    )
    model = UNet3D.from_config(config)
    state = create_train_state(
        config, jax.random.key(0), model, (1, 16, 16, 16, 5)
    )
    step = jax.jit(
        make_cached_train_step(
            model, config, make_train_step(model, config)
        ),
        donate_argnums=(0,),
    )
    n = images.shape[0]
    rng = np.random.default_rng(1)
    key = jax.random.key(7)

    def one(state, i):
        idx = jnp.asarray(
            rng.integers(0, n, size=(batch,)), jnp.int32
        )
        w = jnp.ones((batch,), jnp.float32)
        k = jax.random.fold_in(key, i)
        return step(state, images, labels, idx, w, k)

    # warmup (compile + 2 steady)
    for i in range(3):
        state, m = one(state, i)
    float(m["loss"])
    times = []
    for i in range(steps):
        t0 = time.perf_counter()
        state, m = one(state, 100 + i)
        float(m["loss"])  # completion barrier
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    vox = (crop or size) ** 3 * batch
    return {
        "crop": crop or size,
        "batch": batch,
        "accum": accum,
        "oversample_fg": oversample,
        "augment": augment,
        "strong_aug": strong_aug,
        "ms_per_step": round(dt * 1e3, 1),
        "crops_per_s": round(batch / dt, 2),
        "Mvox_per_s": round(vox / dt / 1e6, 1),
        "vol128_equiv_per_s": round(vox / dt / (128 ** 3), 3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--cases", type=int, default=8)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--only_strong", action="store_true",
                    help="re-measure only the strong-augmentation arms "
                         "(for warp-lowering A/Bs)")
    args = ap.parse_args()

    import jax

    print(f"devices: {jax.devices()}", flush=True)
    images_np, labels_np = make_stacks(args.cases, args.size, 5)
    images = jax.device_put(images_np)
    labels = jax.device_put(labels_np)

    # (crop, batch, accum, oversample_fg, augment, strong_aug, remat)
    arms = [
        (None, 4, 4, 0.0, False, False, False),  # flagship baseline
        (112, 4, 4, 0.0, False, False, False),
        (96, 4, 4, 0.0, False, False, False),
        (96, 8, 8, 0.0, False, False, False),    # voxel-compensated (0.84x)
        (64, 4, 4, 0.0, False, False, False),
        (64, 16, 4, 0.0, False, False, False),   # micro-batch 4 @ 64^3
        (64, 32, 8, 0.0, False, False, False),   # voxels/update == flagship
        (96, 4, 4, 0.33, False, False, False),   # + fg oversample
        (96, 4, 4, 0.33, True, False, False),    # + basic device augs
        (96, 4, 4, 0.33, True, True, False),     # + warp/gamma/noise/blur
        (None, 4, 4, 0.0, True, True, False),    # strong augs @ full volume
    ]
    if args.only_strong:
        arms = [a for a in arms if a[5]]
    results = []
    for crop, batch, accum, ovs, aug, strong, remat in arms:
        try:
            r = run_arm(
                images, labels, crop=crop, batch=batch, accum=accum,
                oversample=ovs, augment=aug, strong_aug=strong, remat=remat,
                steps=args.steps, size=args.size,
            )
        except Exception as e:  # OOM/compile failure is a result too
            r = {
                "crop": crop or args.size, "batch": batch, "accum": accum,
                "oversample_fg": ovs, "augment": aug, "strong_aug": strong,
                "error": f"{type(e).__name__}: {str(e)[:200]}",
            }
        results.append(r)
        print(json.dumps(r), flush=True)
    print(json.dumps({"sweep": results}, indent=1))


if __name__ == "__main__":
    main()
