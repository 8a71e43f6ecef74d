#!/usr/bin/env python
"""End-to-end training throughput: real Trainer + data pipeline on TPU.

bench.py measures the pure device step (3.55 vol/s at the flagship
config); this measures the whole loop — case decode/resample (C++
resampler), .npz cache, prefetching loader, device feed, train step,
checkpoint writes — to show the host pipeline keeps the chip fed.

Epoch 0 pays one-time costs (decode+resample of every case into the
cache, jit compile); epoch 1+ is the steady state to compare against
bench.py's step-only number.

Usage: python tools/bench_e2e_train.py [--cases 16] [--size 128]
       [--epochs 2] [--batch 4] [--accum 4]
"""

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pcmseg_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cases", type=int, default=16)
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--source_size", type=int, default=96,
                   help="on-disk volume size before resample-to-target")
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--accum", type=int, default=4)
    p.add_argument("--train_crop", type=int, default=None, metavar="C",
                   help="train on C^3 random crops (config.train_crop) — "
                        "measures nnU-Net-style patch training, e.g. 64 "
                        "for 64^3 patches of 128^3 cached volumes")
    p.add_argument("--keep", action="store_true")
    args = p.parse_args()

    from pcmseg_tpu.core.config import get_config
    from pcmseg_tpu.data.synthetic import make_synthetic_dataset
    from pcmseg_tpu.train.trainer import Trainer

    root = tempfile.mkdtemp(prefix="pcmseg_e2e_")
    data_dir = os.path.join(root, "data")
    save_dir = os.path.join(root, "ckpt")
    try:
        s = args.source_size
        make_synthetic_dataset(
            data_dir, n_cases=args.cases, data_type="BPH", shape=(s, s, s)
        )
        config = get_config(
            "standard",
            data_dir=data_dir,
            save_dir=save_dir,
            batch_size=args.batch,
            accum_steps=args.accum,
            target_size=(args.size,) * 3,
            num_epochs=args.epochs,
            validation=False,
            data_augmentation=False,
            remat=args.batch // max(args.accum, 1) > 1,
            train_crop=(args.train_crop,) * 3 if args.train_crop else None,
        )
        trainer = Trainer(config)

        epoch_times = []
        orig_epoch = trainer.train_epoch

        def timed_epoch(*a, **kw):
            t0 = time.perf_counter()
            out = orig_epoch(*a, **kw)
            epoch_times.append(time.perf_counter() - t0)
            return out

        trainer.train_epoch = timed_epoch
        trainer.train()

        n = args.cases
        rows = []
        for i, dt in enumerate(epoch_times):
            rows.append(
                {
                    "epoch": i,
                    "seconds": round(dt, 2),
                    "vol_per_s": round(n / dt, 3),
                }
            )
            print(json.dumps(rows[-1]), flush=True)
        if len(epoch_times) > 1:
            steady = n / min(epoch_times[1:])
            print(
                json.dumps(
                    {
                        "metric": "e2e_train_volumes_per_sec (steady-state "
                                  f"epoch, {args.size}^3, batch {args.batch}"
                                  + (f", crop {args.train_crop}^3"
                                     if args.train_crop else "") + ")",
                        "value": round(steady, 3),
                        "unit": "volumes/sec",
                    }
                ),
                flush=True,
            )
    finally:
        if not args.keep:
            shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
