#!/usr/bin/env python
"""On-chip PCA training across all missing-modality strategies
(BASELINE.json configs[2]).

The strategies (reference script/data_loader.py:147-163,318-333) are
covered functionally by tests/test_dataset.py and test_pca_datatype.py on
CPU; this records the product path on the TPU: a synthetic PCA cohort
with dropped modality files, trained for --epochs through the real
Trainer (device cache + jitted steps) once per strategy — zero_fill,
duplicate, and skip — reporting per-strategy case counts, losses, and
vol/s.

Usage: python tools/bench_pca_missing_modality.py [--epochs 2] [--size 64]
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--features", type=int, default=32)
    ap.add_argument("--cases", type=int, default=8)
    args = ap.parse_args()

    import jax

    from pcmseg_tpu.core.cache import enable_compilation_cache
    from pcmseg_tpu.core.config import get_config
    from pcmseg_tpu.data.synthetic import make_synthetic_dataset
    from pcmseg_tpu.train.trainer import Trainer

    enable_compilation_cache()
    size = args.size

    rows = []
    with tempfile.TemporaryDirectory() as tmp:
        root = os.path.join(tmp, "data")
        # two cases missing one modality each, one missing two — the mix
        # every strategy treats differently (zero_fill keeps them with
        # zeroed channels, duplicate substitutes the first available
        # modality's file, skip drops them from the cohort)
        make_synthetic_dataset(
            root,
            n_cases=args.cases,
            data_type="PCA",
            shape=(size, size, size),
            seed=7,
            drop_modalities={
                "case001": ["DWI"],
                "case003": ["T2 fs"],
                "case005": ["DWI", "gaoqing-T2"],
            },
        )
        for strategy in ("zero_fill", "duplicate", "skip"):
            config = get_config(
                "quick",
                data_dir=root,
                data_type="PCA",
                missing_strategy=strategy,
                save_dir=os.path.join(tmp, f"ckpt_{strategy}"),
                base_features=args.features,
                target_size=(size, size, size),
                batch_size=2,
                num_epochs=args.epochs,
                validation=False,
                early_stopping=False,
                cache_dir=os.path.join(tmp, "preproc"),
            )
            trainer = Trainer(config)
            n_cases = len(trainer.train_indices)
            t0 = time.time()
            history = trainer.train()
            wall = time.time() - t0
            losses = [float(x) for x in history["train_loss"]]
            assert np.isfinite(losses).all(), (strategy, losses)
            # steady-state epoch (first epoch carries decode+compile)
            rows.append({
                "strategy": strategy,
                "train_cases": n_cases,
                "final_loss": round(losses[-1], 4),
                "total_s": round(wall, 1),
                "avg_vol_per_s": round(n_cases * args.epochs / wall, 3),
            })
            print(rows[-1], flush=True)

    # skip must have dropped exactly the 3 degraded cases
    by = {r["strategy"]: r for r in rows}
    assert by["skip"]["train_cases"] == args.cases - 3, rows
    assert by["zero_fill"]["train_cases"] == args.cases, rows
    assert by["duplicate"]["train_cases"] == args.cases, rows

    print(json.dumps({
        "config": "BASELINE.json configs[2]: PCA training, all "
                  "missing-modality strategies, on-chip",
        "size": size,
        "features": args.features,
        "epochs": args.epochs,
        "backend": jax.default_backend(),
        "rows": rows,
    }, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
