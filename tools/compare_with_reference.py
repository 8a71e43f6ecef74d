#!/usr/bin/env python
"""Numerics-parity harness: same weights + same inputs through the
reference-architecture PyTorch model and our JAX model.

Implements BASELINE.md's Dice-parity measurement plan: identical weights
(via the torch→flax converter), identical synthetic volumes, then compare
logits and thresholded Dice between frameworks. Prints a JSON report.

Usage: python tools/compare_with_reference.py [--size 32] [--features 8]
"""

import argparse
import json
import sys
import os

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=32)
    ap.add_argument("--features", type=int, default=8)
    ap.add_argument("--cases", type=int, default=3)
    args = ap.parse_args()

    import torch
    import jax
    import jax.numpy as jnp

    from measure_torch_baseline import TorchUNet3D
    from pcmseg_tpu.core.config import get_config
    from pcmseg_tpu.models import UNet3D
    from pcmseg_tpu.ops.metrics import dice_score
    from pcmseg_tpu.train.checkpoints import (
        batch_stats_from_torch_state_dict,
        params_from_torch_state_dict,
    )
    from pcmseg_tpu.train.steps import create_train_state

    torch.manual_seed(0)
    tm = TorchUNet3D(n_mod=5, n_classes=1, f=args.features).eval()
    # rename compact module names to the reference state_dict layout
    sd = {}
    for k, v in tm.state_dict().items():
        k = k.replace("inc.", "inc.conv.")
        for i in range(4):
            k = k.replace(f"downs.{i}.", f"down{i+1}.maxpool_conv.1.conv.")
            k = k.replace(f"ups.{i}.", f"up{i+1}.up.")
            k = k.replace(f"up_convs.{i}.", f"up{i+1}.conv.conv.")
        sd[k] = v

    config = get_config(
        "quick",
        base_features=args.features,
        remat=False,
        compute_dtype="float32",
        target_size=(args.size,) * 3,
    )
    model = UNet3D.from_config(config)
    state = create_train_state(config, jax.random.key(0), model)
    params = params_from_torch_state_dict(sd, state.params)
    stats = batch_stats_from_torch_state_dict(sd, state.batch_stats)

    rng = np.random.default_rng(0)
    report = {"cases": [], "features": args.features, "size": args.size}
    for c in range(args.cases):
        x = rng.normal(size=(1, args.size, args.size, args.size, 5)).astype(
            np.float32
        )
        ours = np.asarray(
            model.apply(
                {"params": params, "batch_stats": stats},
                jnp.asarray(x),
                train=False,
            )
        )
        with torch.no_grad():
            theirs = (
                tm(torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3))))
                .numpy()
            )
        theirs = np.transpose(theirs, (0, 2, 3, 4, 1))

        ours_mask = (1 / (1 + np.exp(-ours)) > 0.5).astype(np.float32)
        theirs_mask = (1 / (1 + np.exp(-theirs)) > 0.5).astype(np.float32)
        mismatch = int((ours_mask != theirs_mask).sum())
        report["cases"].append(
            {
                "max_abs_logit_diff": float(np.abs(ours - theirs).max()),
                "mean_abs_logit_diff": float(np.abs(ours - theirs).mean()),
                "mask_agreement": 1.0 - mismatch / ours_mask.size,
                "mask_voxel_mismatch": mismatch,
            }
        )

    report["max_abs_logit_diff"] = max(
        c["max_abs_logit_diff"] for c in report["cases"]
    )
    report["min_mask_agreement"] = min(c["mask_agreement"] for c in report["cases"])
    print(json.dumps(report, indent=2))
    ok = (
        report["min_mask_agreement"] > 0.999
        and report["max_abs_logit_diff"] < 1e-2
    )
    print(f"PARITY {'OK' if ok else 'FAIL'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
