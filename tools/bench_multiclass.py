#!/usr/bin/env python
"""Multi-class on-chip record — VERDICT round-4 next #6.

Round 4 shipped n_classes>=2 as a real capability (softmax loss family,
integer class maps, per-class Dice in the Validator) with CPU pytest
coverage only. This harness produces the missing evidence ON the chip:

  1. step cost: a 3-class train run vs the binary run at the same
     size/features/batch (the 1x1x1 head grows 1->3 channels; everything
     else is identical, so the delta should be noise — measured, not
     assumed);
  2. efficacy: best val Dice during training plus per-class Dice on the
     held-out phantoms through the REAL ``Validator.validate()``
     (`infer/validate.py` — the same path `run.py validate
     --per_class` users hit), scored from the saved checkpoint so the
     record also covers multi-class checkpoint round-trip.

Cohort: synthetic 3-class nested-sphere PCA phantoms (data/synthetic.py
``n_classes=3`` — class 2 nested inside class 1) at 96^3.

Usage: python tools/bench_multiclass.py [--epochs 20] [--size 96]
"""

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from pcmseg_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()


def train_arm(name, n_classes, root, args):
    from pcmseg_tpu.core.config import get_config
    from pcmseg_tpu.train.trainer import Trainer

    config = get_config(
        "standard",
        data_dir=root,
        data_type="PCA",
        save_dir=os.path.join(root, f"_ckpt_{name}"),
        target_size=(args.size,) * 3,
        base_features=args.features,
        batch_size=args.batch,
        num_epochs=args.epochs,
        learning_rate=args.lr,
        validation=True,
        val_fraction=0.25,
        early_stopping=False,
        remat=False,
        seed=args.seed,
        n_classes=n_classes,
    )
    trainer = Trainer(config)
    # checkpoint only the FINAL epoch: the flagship-size state costs
    # 27-33 s/epoch in D2H saves over the tunnel (BENCH.md "Checkpoint
    # cost") — orthogonal to the step cost measured here, but the
    # Validator still needs a 'best' on disk, so the last save goes
    # through (forced is_best so 'best' holds the final weights)
    orig_save = trainer._save_epoch
    last_epoch = args.epochs - 1

    def save_gate(epoch, monitor, is_best, periodic=None):
        if epoch == last_epoch:
            orig_save(epoch, monitor, True, periodic)

    trainer._save_epoch = save_gate
    epoch_times = []
    orig_epoch = trainer.train_epoch

    def timed(*a, **kw):
        t0 = time.perf_counter()
        out = orig_epoch(*a, **kw)
        epoch_times.append(time.perf_counter() - t0)
        return out

    trainer.train_epoch = timed
    history = trainer.train()
    dices = history.get("val_dice", [])
    n_train = len(trainer.train_indices)
    med = float(np.median(epoch_times[1:])) if len(epoch_times) > 1 else None
    res = {
        "arm": name,
        "n_classes": n_classes,
        "best_val_dice": round(float(max(dices)), 4) if dices else None,
        "median_epoch_s": round(med, 2) if med else None,
        "vol_per_s": round(n_train / med, 3) if med else None,
    }
    return res, config, trainer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--cases", type=int, default=16)
    ap.add_argument("--size", type=int, default=96)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--features", type=int, default=64)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    from pcmseg_tpu.data.synthetic import make_synthetic_dataset
    from pcmseg_tpu.infer.validate import Validator

    root = tempfile.mkdtemp(prefix="pcmseg_mc_")
    try:
        # one binary cohort, one 3-class cohort (same generator seed; the
        # 3-class labels are nested shells of the same lesions)
        bin_root = os.path.join(root, "bin")
        mc_root = os.path.join(root, "mc")
        for r, k in ((bin_root, 1), (mc_root, 3)):
            make_synthetic_dataset(
                r, n_cases=args.cases, data_type="PCA",
                shape=(args.size,) * 3, seed=43, n_classes=k,
            )

        out = {"size": args.size, "features": args.features,
               "batch": args.batch, "epochs": args.epochs}

        res_bin, _, tr_bin = train_arm("binary", 1, bin_root, args)
        print(json.dumps(res_bin), flush=True)
        del tr_bin

        res_mc, cfg_mc, tr_mc = train_arm("3class", 3, mc_root, args)
        print(json.dumps(res_mc), flush=True)

        # per-class Dice on the held-out phantoms from the SAVED best
        # checkpoint (covers the multi-class Orbax round trip too)
        val_idx = list(tr_mc.val_indices)
        dataset = tr_mc.dataset
        del tr_mc
        v = Validator(
            cfg_mc, os.path.join(cfg_mc.save_dir, "best"),
            dataset=dataset, indices=val_idx,
        )
        scored = v.validate(save=False)
        out.update({
            "binary": res_bin,
            "multiclass": res_mc,
            "step_cost_ratio_3class_vs_binary": round(
                res_mc["median_epoch_s"] / res_bin["median_epoch_s"], 4
            ),
            "val_avg_dice": round(scored["avg_dice"], 4),
            "val_avg_dice_per_class": scored.get("avg_dice_per_class"),
            "val_cases": len(scored["case_results"]),
        })
        print(json.dumps({"bench_multiclass": out}, indent=1))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
