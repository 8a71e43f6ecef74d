#!/usr/bin/env python
"""Held-out-split Dice convergence parity at scale (VERDICT round-1 #7).

Trains our stack and the torch reference side by side on the identical
synthetic dataset (same preprocessing — ours feeds both — same batch
order, same optimizer settings), holding out a validation split, and
compares *val-split* Dice. With ``--use_reference_class`` the torch side is
the ACTUAL reference model (``/root/reference/models/unet3d.py:160-296``,
init_features hardwired to 64) rather than the compact reimplementation —
closing VERDICT item #2(c).

Recommended runs (recorded in PARITY.md):
  BPH, 64³, base 64, real reference class:
    python tools/convergence_parity_scaled.py --data_type BPH --size 64 \
        --use_reference_class --epochs 12
  PCA, 64³, base 64, real reference class:
    python tools/convergence_parity_scaled.py --data_type PCA --size 64 \
        --use_reference_class --epochs 12
  Recalibration-free eval-mode row (enough steps that BN running stats
  catch the weights in BOTH stacks — no crutch on either side):
    python tools/convergence_parity_scaled.py --data_type BPH --size 64 \
        --use_reference_class --epochs 40 --cases 12 --bn_recalib_passes 0

Prints a JSON report; PASS if val_dice_jax >= val_dice_torch - 0.005
(one-sided, the north star's 0.5%-of-Dice band: we may converge at most
0.5 Dice points worse; better is success) and val_dice_jax > 0.5.
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REFERENCE_ROOT = "/root/reference"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--features", type=int, default=64)
    ap.add_argument("--cases", type=int, default=8)
    ap.add_argument("--val_cases", type=int, default=2)
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--data_type", choices=["BPH", "PCA"], default="BPH")
    ap.add_argument("--seed", type=int, default=None,
                    help="synthetic-dataset seed; defaults to 42 for BPH "
                         "and 43 for PCA so the two splits are genuinely "
                         "different datasets (with one shared seed the "
                         "generator's content is data_type-independent and "
                         "the two rows would be the same run twice)")
    ap.add_argument("--use_reference_class", action="store_true",
                    help="torch side = the real reference UNet3D (base 64)")
    ap.add_argument("--save_ckpt", default=None,
                    help="write the trained jax variables (params + "
                         "batch_stats, flax msgpack) here after eval — "
                         "feeds tools/bench_tta.py's converged-model TTA "
                         "A/B (VERDICT round-2 #4)")
    ap.add_argument("--bn_recalib_passes", type=int, default=10,
                    help="BN running-stat recalibration passes over the "
                         "train split before eval, applied to BOTH stacks "
                         "symmetrically. At this harness's tiny scale "
                         "(~36 optimizer steps) running stats lag the "
                         "fast-moving weights so badly that eval-mode Dice "
                         "collapses in BOTH frameworks (measured: ours "
                         "0.002, torch 0.35, while train-mode losses imply "
                         "~0.99) — recalibrating with the final weights "
                         "isolates what this tool measures: weight-learning "
                         "parity. At production scale (100s of steps/epoch) "
                         "the artifact vanishes. 0 disables.")
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
    torch.set_num_threads(os.cpu_count() or 1)

    if args.use_reference_class:
        assert args.features == 64, "the reference class hardwires base 64"
        sys.path.insert(0, REFERENCE_ROOT)
        from models.unet3d import UNet3D as RefTorchUNet3D

        sys.path.remove(REFERENCE_ROOT)

    with tempfile.TemporaryDirectory() as root:
        seed = args.seed
        if seed is None:
            seed = 42 if args.data_type == "BPH" else 43
        make_synthetic_dataset(
            root,
            n_cases=args.cases,
            data_type=args.data_type,
            shape=(args.size, args.size, args.size),
            seed=seed,
        )
        ds = ProstateDataset(
            root,
            data_type=args.data_type,
            target_size=(args.size,) * 3,
            normalize="percentile",
        )
        samples = [ds[i] for i in range(len(ds))]
        # fp32 for the torch side (the pipeline's wire format is bf16/uint8)
        images = np.stack(
            [s["image"] for s in samples]
        ).astype(np.float32)  # (N,D,H,W,C)
        labels = np.stack(
            [s["label"] for s in samples]
        ).astype(np.float32)  # (N,D,H,W,1)
        n = len(samples)
        val_idx = list(range(args.val_cases))  # held-out split
        train_idx = list(range(args.val_cases, n))

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

        # ---- torch (reference class or compact reimplementation) ------------
        torch.manual_seed(0)
        if args.use_reference_class:
            tmodel = RefTorchUNet3D(n_modalities=5, n_classes=1)
        else:
            tmodel = TorchUNet3D(n_mod=5, n_classes=1, f=args.features)
        topt = torch.optim.Adam(
            tmodel.parameters(), lr=args.lr, weight_decay=1e-5
        )

        order_rng = np.random.default_rng(7)
        nt = len(train_idx)
        for epoch in range(args.epochs):
            t0 = time.time()
            order = order_rng.permutation(train_idx)
            for i in range(0, nt - nt % args.batch, args.batch):
                idx = order[i : i + args.batch]
                img_np, lab_np = images[idx], labels[idx]

                state, m = step(
                    state,
                    {"image": jnp.asarray(img_np), "label": jnp.asarray(lab_np)},
                )
                jl = float(m["loss"])  # completion barrier

                topt.zero_grad()
                timg = torch.from_numpy(np.transpose(img_np, (0, 4, 1, 2, 3)))
                tlab = torch.from_numpy(np.transpose(lab_np, (0, 4, 1, 2, 3)))
                tloss = torch_dice(tmodel(timg), tlab)
                tloss.backward()
                torch.nn.utils.clip_grad_norm_(tmodel.parameters(), 1.0)
                topt.step()
            print(
                f"epoch {epoch}: jax loss {jl:.4f} "
                f"torch loss {float(tloss):.4f} ({time.time() - t0:.0f}s)",
                flush=True,
            )

        # ---- symmetric BN running-stat recalibration --------------------------
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        if args.bn_recalib_passes > 0:
            apply_train = jax.jit(
                lambda v, x: model.apply(
                    v, x, train=True, mutable=["batch_stats"]
                )
            )
            tmodel.train()
            nb = nt - nt % args.batch
            for _ in range(args.bn_recalib_passes):
                for i in range(0, nb, args.batch):
                    idx = train_idx[i : i + args.batch]
                    img_np = images[idx]
                    _, upd = apply_train(variables, jnp.asarray(img_np))
                    variables = {
                        "params": variables["params"],
                        "batch_stats": upd["batch_stats"],
                    }
                    with torch.no_grad():
                        tmodel(
                            torch.from_numpy(
                                np.transpose(img_np, (0, 4, 1, 2, 3))
                            )
                        )

        # ---- evaluate held-out-split Dice in both frameworks ------------------
        apply_eval = jax.jit(lambda v, x: model.apply(v, x, train=False))
        tmodel.eval()

        def split_dice(idx_list):
            jd, td = [], []
            for i in idx_list:
                img, lab = images[i : i + 1], labels[i : i + 1]
                logits = apply_eval(variables, jnp.asarray(img))
                jmask = (jax.nn.sigmoid(logits) > 0.5).astype(jnp.float32)
                jd.append(float(dice_score(jmask, jnp.asarray(lab))))
                with torch.no_grad():
                    tout = tmodel(
                        torch.from_numpy(np.transpose(img, (0, 4, 1, 2, 3)))
                    )
                tmask = (torch.sigmoid(tout) > 0.5).float().numpy()
                tmask = np.transpose(tmask, (0, 2, 3, 4, 1))
                td.append(float(dice_score(jnp.asarray(tmask), jnp.asarray(lab))))
            return float(np.mean(jd)), float(np.mean(td))

        val_jax, val_torch = split_dice(val_idx)
        train_jax, train_torch = split_dice(train_idx)

        if args.save_ckpt:
            import flax.serialization

            with open(args.save_ckpt, "wb") as f:
                f.write(flax.serialization.to_bytes(variables))
            print(f"saved trained variables -> {args.save_ckpt}")

        report = {
            "data_type": args.data_type,
            "seed": seed,
            "size": args.size,
            "features": args.features,
            "epochs": args.epochs,
            "torch_model": (
                "reference class (models/unet3d.py)"
                if args.use_reference_class
                else "compact reimplementation"
            ),
            "train_cases": nt,
            "val_cases": len(val_idx),
            "bn_recalib_passes": args.bn_recalib_passes,
            "val_dice_jax": round(val_jax, 4),
            "val_dice_torch": round(val_torch, 4),
            "val_abs_diff": round(abs(val_jax - val_torch), 4),
            "train_dice_jax": round(train_jax, 4),
            "train_dice_torch": round(train_torch, 4),
        }
        print(json.dumps(report, indent=2))
        # one-sided gate at the north star's 0.5%: we may converge at most
        # 0.005 Dice WORSE than the reference; beating it (e.g. PCA
        # base-16: ours 0.976 vs torch 0.917) is success, not failure.
        ok = val_jax >= val_torch - 0.005 and val_jax > 0.5
        print(f"CONVERGENCE PARITY {'OK' if ok else 'FAIL'}")
        return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
