#!/usr/bin/env python
"""Host-decode A/B for the serving path (BENCH.md configs[4] host share).

Measures load_multimodal_images → device-ready bf16 stack on a synthetic
5-modality case at native serving resolution, three ways:
  * numpy:      the pre-round-3 chain (numpy percentile/clip/scale per
                modality, float32 stack, then the predictor's
                float32→bfloat16 cast) — forced by disabling the native
                normalize;
  * native_f32: fused C++ normalize into a float32 stack (public-API
                default), plus the same downstream bf16 cast;
  * native_bf16: fused C++ normalize+cast+stack straight to the bf16 wire
                (what Predictor/serve now request) — zero extra passes.

Usage: python tools/bench_host_decode.py [--shape 160,192,192] [--reps 5]
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="160,192,192")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()
    shape = tuple(int(s) for s in args.shape.split(","))

    import ml_dtypes

    import pcmseg_tpu.data.native as native_mod
    from pcmseg_tpu.core.config import DEFAULT_MODALITIES
    from pcmseg_tpu.data.synthetic import make_synthetic_dataset
    from pcmseg_tpu.infer.predict import load_multimodal_images

    with tempfile.TemporaryDirectory() as root:
        make_synthetic_dataset(root, n_cases=1, shape=shape, seed=0)
        # stage into the predict layout (per-modality subdirs), same as
        # tools/bench_predict_e2e.py
        case_dir = os.path.join(root, "staged", "case000")
        for m in DEFAULT_MODALITIES:
            os.makedirs(os.path.join(case_dir, m), exist_ok=True)
            os.link(
                os.path.join(root, "BPH-PCA", "BPH", m, "case000.nii.gz"),
                os.path.join(case_dir, m, "image.nii.gz"),
            )

        def run(out_dtype, disable_native):
            saved = native_mod.native_normalize_into
            if disable_native:
                native_mod.native_normalize_into = (
                    lambda *a, **k: False
                )  # numpy fallback
            try:
                t0 = time.perf_counter()
                img, _ = load_multimodal_images(case_dir, out_dtype=out_dtype)
                if img.dtype != ml_dtypes.bfloat16:  # predictor's wire cast
                    img = img.astype(np.float32).astype(ml_dtypes.bfloat16)
                return time.perf_counter() - t0
            finally:
                native_mod.native_normalize_into = saved

        results = {}
        for name, (dt, dis) in {
            "numpy": (np.float32, True),
            "native_f32": (np.float32, False),
            "native_bf16": (ml_dtypes.bfloat16, False),
        }.items():
            ts = [run(dt, dis) for _ in range(args.reps)]
            results[name] = min(ts)
            print(f"{name:12s} best {min(ts):.3f}s  all {[f'{t:.3f}' for t in ts]}")
        print(
            f"speedup numpy -> native_bf16: "
            f"{results['numpy'] / results['native_bf16']:.2f}x"
        )


if __name__ == "__main__":
    main()
