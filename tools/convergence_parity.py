#!/usr/bin/env python
"""Dice-convergence parity: our stack vs the reference architecture in torch.

BASELINE.md's measurement plan: train both frameworks on the *identical*
synthetic dataset (same preprocessing — ours feeds both — same batch
order, same optimizer settings), then compare converged train-set Dice.
The reference publishes no accuracy numbers, so agreement between the two
trainings on a controlled task is the Dice-parity evidence.

Usage: python tools/convergence_parity.py [--epochs 12] [--size 32]
Prints a JSON report; PASS if |dice_jax - dice_torch| <= 0.03.
"""

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--size", type=int, default=32)
    ap.add_argument("--features", type=int, default=8)
    ap.add_argument("--cases", type=int, default=8)
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--batch", type=int, default=2)
    args = ap.parse_args()

    import torch

    import jax
    import jax.numpy as jnp

    from measure_torch_baseline import TorchUNet3D, dice_loss as torch_dice
    from pcmseg_tpu.core.cache import enable_compilation_cache
    from pcmseg_tpu.core.config import get_config
    from pcmseg_tpu.data.dataset import ProstateDataset
    from pcmseg_tpu.data.synthetic import make_synthetic_dataset
    from pcmseg_tpu.models import UNet3D
    from pcmseg_tpu.ops.metrics import dice_score
    from pcmseg_tpu.train.steps import (
        create_train_state,
        jit_train_step,
        make_train_step,
    )

    enable_compilation_cache()

    with tempfile.TemporaryDirectory() as root:
        make_synthetic_dataset(
            root, n_cases=args.cases, shape=(args.size, args.size, args.size),
            seed=42,
        )
        ds = ProstateDataset(
            root, target_size=(args.size,) * 3, normalize="percentile"
        )
        samples = [ds[i] for i in range(len(ds))]
        # fp32 for the torch side (the pipeline's wire format is bf16/uint8)
        images = np.stack(
            [s["image"] for s in samples]
        ).astype(np.float32)  # (N,D,H,W,C)
        labels = np.stack(
            [s["label"] for s in samples]
        ).astype(np.float32)  # (N,D,H,W,1)

        # ---- ours ----------------------------------------------------------
        config = get_config(
            "quick", base_features=args.features, remat=False,
            compute_dtype="float32", target_size=(args.size,) * 3,
            learning_rate=args.lr, batch_size=args.batch,
        )
        model = UNet3D.from_config(config)
        state = create_train_state(
            config, jax.random.key(0), model,
            (args.batch, *([args.size] * 3), 5),
        )
        step = jit_train_step(make_train_step(model, config), donate=False)

        # ---- torch (reference architecture) ---------------------------------
        torch.manual_seed(0)
        tmodel = TorchUNet3D(n_mod=5, n_classes=1, f=args.features)
        topt = torch.optim.Adam(
            tmodel.parameters(), lr=args.lr, weight_decay=1e-5
        )

        order_rng = np.random.default_rng(7)
        n = len(samples)
        for epoch in range(args.epochs):
            order = order_rng.permutation(n)
            for i in range(0, n - n % args.batch, args.batch):
                idx = order[i : i + args.batch]
                img_np, lab_np = images[idx], labels[idx]

                state, m = step(
                    state,
                    {"image": jnp.asarray(img_np), "label": jnp.asarray(lab_np)},
                )

                topt.zero_grad()
                timg = torch.from_numpy(np.transpose(img_np, (0, 4, 1, 2, 3)))
                tlab = torch.from_numpy(np.transpose(lab_np, (0, 4, 1, 2, 3)))
                tloss = torch_dice(tmodel(timg), tlab)
                tloss.backward()
                torch.nn.utils.clip_grad_norm_(tmodel.parameters(), 1.0)
                topt.step()
            print(
                f"epoch {epoch}: jax loss {float(m['loss']):.4f} "
                f"torch loss {float(tloss):.4f}",
                flush=True,
            )

        # ---- evaluate train-set Dice in both frameworks ----------------------
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        jax_dices, torch_dices = [], []
        tmodel.eval()
        for i in range(n):
            img, lab = images[i : i + 1], labels[i : i + 1]
            probs = model.apply(variables, jnp.asarray(img), train=False)
            jmask = (jax.nn.sigmoid(probs) > 0.5).astype(jnp.float32)
            jax_dices.append(float(dice_score(jmask, jnp.asarray(lab))))
            with torch.no_grad():
                tout = tmodel(
                    torch.from_numpy(np.transpose(img, (0, 4, 1, 2, 3)))
                )
            tmask = (torch.sigmoid(tout) > 0.5).float().numpy()
            tmask = np.transpose(tmask, (0, 2, 3, 4, 1))
            torch_dices.append(
                float(dice_score(jnp.asarray(tmask), jnp.asarray(lab)))
            )

        report = {
            "epochs": args.epochs,
            "jax_mean_dice": float(np.mean(jax_dices)),
            "torch_mean_dice": float(np.mean(torch_dices)),
        }
        report["abs_diff"] = abs(
            report["jax_mean_dice"] - report["torch_mean_dice"]
        )
        print(json.dumps(report, indent=2))
        ok = report["abs_diff"] <= 0.03 and report["jax_mean_dice"] > 0.5
        print(f"CONVERGENCE PARITY {'OK' if ok else 'FAIL'}")
        return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
