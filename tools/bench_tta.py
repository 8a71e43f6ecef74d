#!/usr/bin/env python
"""TTA A/B on a CONVERGED checkpoint (VERDICT round-2 weak #4).

Round 2's TTA table measured a deliberately under-trained model (4
epochs, 48³, base 16), where orientation ensembling has the most to
offer. A user reaches for ``--tta`` on a *converged* model, so this tool
re-runs the identical plain-vs-8-way-flip-ensemble comparison on the
checkpoint produced by the scaled-parity run
(``tools/convergence_parity_scaled.py --save_ckpt``), over the same
held-out split (same synthetic dataset: per-data_type seed default
matching the parity tool's, first ``--val_cases`` cases held out).

Usage (after a parity run saved its variables):
    python tools/convergence_parity_scaled.py --data_type BPH --size 64 \
        --use_reference_class --epochs 12 --save_ckpt /tmp/parity_bph.msgpack
    python tools/bench_tta.py --ckpt /tmp/parity_bph.msgpack \
        --data_type BPH --size 64

Prints per-case plain/TTA Dice and the mean delta — the BENCH.md
"converged model" row.
"""

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True,
                    help="msgpack variables from convergence_parity_scaled "
                         "--save_ckpt")
    ap.add_argument("--data_type", choices=["BPH", "PCA"], default="BPH")
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--features", type=int, default=64)
    ap.add_argument("--cases", type=int, default=8)
    ap.add_argument("--val_cases", type=int, default=2)
    ap.add_argument("--seed", type=int, default=None,
                    help="must match the parity run's dataset seed "
                         "(default: 42 for BPH, 43 for PCA — the same "
                         "per-data_type defaults as "
                         "convergence_parity_scaled.py)")
    args = ap.parse_args()
    if args.seed is None:
        args.seed = 42 if args.data_type == "BPH" else 43

    import flax.serialization
    import jax
    import jax.numpy as jnp

    from pcmseg_tpu.core.cache import enable_compilation_cache
    from pcmseg_tpu.core.config import get_config
    from pcmseg_tpu.data.dataset import ProstateDataset
    from pcmseg_tpu.data.synthetic import make_synthetic_dataset
    from pcmseg_tpu.infer.tta import make_tta_apply
    from pcmseg_tpu.models import UNet3D
    from pcmseg_tpu.ops.metrics import dice_score

    enable_compilation_cache()

    with tempfile.TemporaryDirectory() as root:
        make_synthetic_dataset(
            root,
            n_cases=args.cases,
            data_type=args.data_type,
            shape=(args.size, args.size, args.size),
            seed=args.seed,
        )
        ds = ProstateDataset(
            root,
            data_type=args.data_type,
            target_size=(args.size,) * 3,
            normalize="percentile",
        )
        samples = [ds[i] for i in range(len(ds))]
    images = np.stack([s["image"] for s in samples]).astype(np.float32)
    labels = np.stack([s["label"] for s in samples]).astype(np.float32)

    config = get_config(
        "quick", base_features=args.features, remat=False,
        compute_dtype="float32", target_size=(args.size,) * 3,
    )
    model = UNet3D.from_config(config)
    template = model.init(
        jax.random.key(0), jnp.zeros((1, *([args.size] * 3), 5)), train=False
    )
    with open(args.ckpt, "rb") as f:
        variables = flax.serialization.from_bytes(template, f.read())

    probs_fn = jax.jit(
        lambda v, x: jax.nn.sigmoid(model.apply(v, x, train=False))
    )
    tta_fn = jax.jit(make_tta_apply(probs_fn))

    rows = []
    for i in range(args.val_cases):
        img = jnp.asarray(images[i : i + 1])
        lab = jnp.asarray(labels[i : i + 1])
        d_plain = float(dice_score(
            (probs_fn(variables, img) > 0.5).astype(jnp.float32), lab))
        d_tta = float(dice_score(
            (tta_fn(variables, img) > 0.5).astype(jnp.float32), lab))
        rows.append({"case": i, "plain": round(d_plain, 4),
                     "tta": round(d_tta, 4)})
        print(f"case {i}: plain {d_plain:.4f}  tta {d_tta:.4f}", flush=True)

    mp = float(np.mean([r["plain"] for r in rows]))
    mt = float(np.mean([r["tta"] for r in rows]))
    report = {
        "data_type": args.data_type,
        "seed": args.seed,
        "size": args.size,
        "features": args.features,
        "ckpt": args.ckpt,
        "cases": rows,
        "val_mean_plain": round(mp, 4),
        "val_mean_tta": round(mt, 4),
        "delta": round(mt - mp, 4),
    }
    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
