#!/usr/bin/env python
"""Checkpoint cost on the flagship state: full save (D2H + serialize) vs
host-side copy (copy_checkpoint). Motivates the one-fetch-per-epoch save
path (train/trainer.py _save_epoch): on a tunneled/remote chip the D2H
fetch is the dominant term and contends with the training stream.

Usage: python tools/bench_checkpoint_cost.py [--features 64] [--reps 3]
"""

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from pcmseg_tpu.core.cache import enable_compilation_cache
from pcmseg_tpu.core.config import get_config
from pcmseg_tpu.models import UNet3D
from pcmseg_tpu.train.checkpoints import copy_checkpoint, save_checkpoint
from pcmseg_tpu.train.steps import create_train_state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--features", type=int, default=64)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    enable_compilation_cache()
    config = get_config("standard", base_features=args.features)
    model = UNet3D.from_config(config)
    state = create_train_state(config, jax.random.key(0), model)
    n_bytes = sum(
        a.size * a.dtype.itemsize
        for a in jax.tree.leaves(
            {"p": state.params, "o": state.opt_state, "b": state.batch_stats}
        )
    )

    # a training epoch hands the saver FRESH device arrays each time;
    # re-saving the same jax.Arrays would hit their cached host copies
    # (_npy_value) and fake a ~15x cheaper save, so refresh between reps
    refresh = jax.jit(lambda s: jax.tree.map(lambda x: x + 0, s))

    with tempfile.TemporaryDirectory() as d:
        saves, copies = [], []
        for _ in range(args.reps):
            state = refresh(state)
            t0 = time.perf_counter()
            save_checkpoint(d, "latest", state, {"epoch": 0})
            saves.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            copy_checkpoint(d, "latest", "best")
            copies.append(time.perf_counter() - t0)
        disk = shutil.disk_usage(d)
        print(
            json.dumps(
                {
                    "state_bytes": n_bytes,
                    "state_gb": round(n_bytes / 1e9, 3),
                    "save_s": [round(s, 2) for s in saves],
                    "copy_s": [round(s, 2) for s in copies],
                    "save_min_s": round(min(saves), 2),
                    "copy_min_s": round(min(copies), 2),
                    "disk_free_gb": round(disk.free / 1e9, 1),
                }
            )
        )


if __name__ == "__main__":
    main()
