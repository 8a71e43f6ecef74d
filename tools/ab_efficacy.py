#!/usr/bin/env python
"""Efficacy A/B of the training-feature batch — VERDICT round-3 #2.

Round 3 shipped deep supervision, EMA, tversky/focal losses, cosine/poly
schedules, patch training and largest_cc postprocessing with correctness
tests but no efficacy evidence. This harness trains the REAL Trainer on
one fixed synthetic cohort per arm (identical data, seeds, epochs, LR)
and reports converged held-out Dice so each feature gets a
keep/re-default/no-op verdict (the repo's wire-or-delete rule).

Cohort: synthetic PCA at difficulty="hard" (low-contrast irregular
multi-blob lesions, textured background + bias field, one near-blind
modalities — data/synthetic.py) — the easy sphere phantom saturates
every arm at Dice ~0.999 within 8 epochs and cannot discriminate
recipes. 20 cases at 96^3, 25% held out. Checkpoint writes are no-op'd (the 1 GB flagship-sized
state costs 27-33 s/epoch over the tunneled chip — BENCH.md
"Checkpoint cost" — and is orthogonal to what this measures).

The largest_cc arm is post-hoc: the baseline arm's final weights are
scored on the val split with and without connected-component filtering.

Round 5 (VERDICT r4 next #3/#4/#7): multi-seed support — ``--seeds
42,7,1234`` runs every arm at each config seed (same cohort; seed moves
init/split/shuffle/augmentation draws) and reports mean±std per arm, so
recommendations rest on spread the table itself shows. New arms: the
nnU-Net 'center' vs round-4 'window' foreground-oversampling A/B and
half/quarter-magnitude strong-augmentation rungs.

Usage: python tools/ab_efficacy.py [--epochs 14] [--arms baseline,ema,...]
       [--seeds 42,7,1234]
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

# arm name -> config overrides (over the shared base)
ARMS = {
    "baseline": {},
    "crop64": {"train_crop": (64, 64, 64)},
    # foreground-oversampling mechanism A/B (VERDICT r4 next #4):
    # 'center' = true nnU-Net (deterministic per-batch fraction, crop
    # centered on a fg voxel); 'window' = the round-4 variant
    "crop64_fgos_center": {
        "train_crop": (64, 64, 64), "oversample_fg": 0.33,
        "oversample_mode": "center",
    },
    "crop64_fgos_window": {
        "train_crop": (64, 64, 64), "oversample_fg": 0.33,
        "oversample_mode": "window",
    },
    "deep_supervision": {"deep_supervision": True},
    "ema": {"ema_decay": 0.999},
    "tversky": {"loss": "tversky"},
    "focal_dice": {"loss": "focal_dice"},
    "cosine_warmup": {"scheduler": "cosine", "warmup_epochs": 2},
    "poly": {"scheduler": "poly"},
    "augment": {"data_augmentation": True},
    # round-4 extended device augmentation (nnU-Net-style spatial +
    # intensity transforms, data/device_cache.py::device_augment)
    "augment_strong": {
        "data_augmentation": True,
        "aug_scale": 0.15,
        "aug_rotate_deg": 20.0,
        "aug_gamma": 0.3,
        "aug_noise": 0.1,
        "aug_blur_prob": 0.2,
    },
    # magnitude sweep (VERDICT r4 next #7): the full-magnitude verdict
    # was negative at ONE dose on a 15-case cohort — half and quarter
    # rungs decide whether any strong-aug magnitude earns a default
    "augment_strong_half": {
        "data_augmentation": True,
        "aug_scale": 0.075,
        "aug_rotate_deg": 10.0,
        "aug_gamma": 0.15,
        "aug_noise": 0.05,
        "aug_blur_prob": 0.1,
    },
    "augment_strong_quarter": {
        "data_augmentation": True,
        "aug_scale": 0.04,
        "aug_rotate_deg": 5.0,
        "aug_gamma": 0.08,
        "aug_noise": 0.025,
        "aug_blur_prob": 0.05,
    },
    # best-of-breed combination (the nnU-Net-style recipe the single-arm
    # winners suggest): patch training + deep supervision + tversky +
    # basic augmentation
    "combo": {
        "train_crop": (64, 64, 64),
        "deep_supervision": True,
        "loss": "tversky",
        "data_augmentation": True,
    },
}


def run_arm(name, overrides, data_dir, args):
    import jax
    import jax.numpy as jnp

    from pcmseg_tpu.core.config import get_config
    from pcmseg_tpu.train.trainer import Trainer

    config = get_config(
        "standard",
        data_dir=data_dir,
        data_type="PCA",
        save_dir=os.path.join(data_dir, f"_ckpt_{name}"),
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
        **overrides,
    )
    trainer = Trainer(config)
    trainer._save_epoch = lambda *a, **kw: None  # see module docstring

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
    best = float(max(dices)) if dices else float("nan")
    res = {
        "arm": name,
        "best_val_dice": round(best, 4),
        "final_val_dice": round(float(dices[-1]), 4) if dices else None,
        "best_epoch": int(np.argmax(dices)) if dices else None,
        "epochs_to_0.90": next(
            (i for i, d in enumerate(dices) if d >= 0.90), None
        ),
        "median_epoch_s": round(float(np.median(epoch_times[1:])), 2)
        if len(epoch_times) > 1 else None,
    }
    return res, trainer


def score_postprocess(trainer):
    """Baseline weights, val split: Dice with vs without largest_cc."""
    import jax
    import jax.numpy as jnp

    from pcmseg_tpu.infer.postprocess import postprocess_mask

    model, state = trainer.model, trainer.state
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    apply_eval = jax.jit(lambda v, x: model.apply(v, x, train=False))
    raw, post = [], []
    for i in trainer.val_indices:
        s = trainer.dataset[i]
        img = jnp.asarray(np.asarray(s["image"], np.float32)[None])
        lab = np.asarray(s["label"])[..., 0] > 0
        logits = apply_eval(variables, img)
        mask = np.asarray(
            jax.nn.sigmoid(logits[0, ..., 0]) > 0.5, np.uint8
        )
        filt = postprocess_mask(mask, mode="largest_cc")

        def dice(m):
            inter = float(np.sum((m > 0) & lab))
            return (2 * inter) / (float(m.sum()) + float(lab.sum()) + 1e-8)

        raw.append(dice(mask))
        post.append(dice(filt))
    return {
        "arm": "largest_cc (post-hoc on baseline)",
        "val_dice_raw": round(float(np.mean(raw)), 4),
        "val_dice_largest_cc": round(float(np.mean(post)), 4),
        "delta": round(float(np.mean(post) - np.mean(raw)), 4),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--cases", type=int, default=20)
    ap.add_argument("--size", type=int, default=96)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--features", type=int, default=64)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--seeds", default=None,
                    help="comma list of config seeds; overrides --seed "
                         "and reports mean±std per arm")
    ap.add_argument("--arms", default=None,
                    help="comma list; default = all")
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    import shutil
    import tempfile

    from pcmseg_tpu.data.synthetic import make_synthetic_dataset

    root = tempfile.mkdtemp(prefix="pcmseg_ab_")
    try:
        make_synthetic_dataset(
            root, n_cases=args.cases, data_type="PCA",
            shape=(args.size,) * 3, seed=43, difficulty="hard",
        )
        names = (
            args.arms.split(",") if args.arms else list(ARMS.keys())
        )
        seeds = (
            [int(s) for s in args.seeds.split(",")]
            if args.seeds else [args.seed]
        )
        results = []
        agg = {}
        for name in names:
            per_seed = []
            for seed in seeds:
                args.seed = seed
                res, trainer = run_arm(name, ARMS[name], root, args)
                res["seed"] = seed
                per_seed.append(res)
                results.append(res)
                print(json.dumps(res), flush=True)
                if name == "baseline" and seed == seeds[0]:
                    pp = score_postprocess(trainer)
                    results.append(pp)
                    print(json.dumps(pp), flush=True)
                del trainer
            best = [r["best_val_dice"] for r in per_seed]
            final = [r["final_val_dice"] for r in per_seed]
            agg[name] = {
                "seeds": seeds,
                "best_val_dice": [round(b, 4) for b in best],
                "mean": round(float(np.mean(best)), 4),
                "std": round(float(np.std(best, ddof=1)), 4)
                if len(best) > 1 else None,
                "final_mean": round(float(np.mean(final)), 4),
            }
            print(json.dumps({"arm_summary": name, **agg[name]}), flush=True)
        print(json.dumps({"ab_efficacy": results, "summary": agg}, indent=1))
    finally:
        if not args.keep:
            shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
