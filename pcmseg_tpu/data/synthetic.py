"""Synthetic BPH/PCA data trees for tests and benchmarks.

Writes reference-layout NIfTI trees
(``{root}/BPH-PCA/{data_type}/{modality}/{case}.nii.gz`` + labels under
``ROI(BPH+PCA)``) with sphere-lesion phantoms, so the full pipeline —
discovery, filtering, strategies, resampling, training, validation,
prediction — runs end-to-end without real patient data (the test strategy
SURVEY.md §4 calls for).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import numpy as np

from pcmseg_tpu.core.config import DEFAULT_MODALITIES
from pcmseg_tpu.data.dataset import LABEL_DIR
from pcmseg_tpu.data.nifti import write_nifti
from pcmseg_tpu.data.volume import Volume


def _smooth_field(rng: np.random.Generator, shape, sigma_vox: float):
    """Unit-variance smooth random field: Gaussian-blurred white noise
    (scipy.ndimage, already a host-side dependency via ops/surface.py),
    deterministic under ``rng``."""
    from scipy.ndimage import gaussian_filter

    x = gaussian_filter(
        rng.normal(size=shape).astype(np.float32), sigma=sigma_vox
    )
    s = float(x.std())
    return x / (s if s > 0 else 1.0)


def make_case(
    rng: np.random.Generator,
    shape: Tuple[int, int, int] = (24, 24, 24),
    n_modalities: int = 5,
    n_classes: int = 1,
    difficulty: str = "easy",
):
    """One phantom: per-modality noisy views of a random lesion.

    With ``n_classes >= 2`` the label is an integer class map of nested
    spheres: class 1 is the outer shell, class 2 a concentric core at
    ~60% radius, class 3 at ~35%, ... (each class gets its own intensity
    contrast so a multi-class model can actually tell them apart).

    ``difficulty="easy"`` (default, the original phantom) is a single
    high-contrast sphere (SNR ~5-20x) — right for pipeline/e2e tests,
    but a U-Net saturates Dice ≈ 1.0 on it within a few epochs, so it
    cannot discriminate training recipes. ``difficulty="hard"`` is the
    efficacy-benchmark phantom: an irregular union of 1-3 random
    ellipsoids, low contrast (0.2-0.6x, sign fixed per modality —
    alternating hypo-/hyper-intense), one modality with near-zero lesion
    visibility (mpMRI-style: the lesion shows in ADC/DWI, barely in
    T2), a smooth multiplicative bias field, textured background
    (smooth random field), and stronger voxel noise.
    """
    d, h, w = shape
    zz, yy, xx = np.meshgrid(
        np.arange(d), np.arange(h), np.arange(w), indexing="ij"
    )
    hard = difficulty == "hard"
    center = rng.uniform(0.3, 0.7, size=3) * np.array(shape)
    radius = rng.uniform(0.15, 0.25) * min(shape)
    dist = np.sqrt(
        (zz - center[0]) ** 2 + (yy - center[1]) ** 2 + (xx - center[2]) ** 2
    )
    if hard:
        # union of 1-3 random ellipsoids clustered around the center
        n_blobs = int(rng.integers(1, 4))
        lesion = np.zeros(shape, bool)
        for _ in range(n_blobs):
            c = center + rng.uniform(-0.08, 0.08, size=3) * min(shape)
            radii = rng.uniform(0.07, 0.16, size=3) * min(shape)
            q = (
                ((zz - c[0]) / radii[0]) ** 2
                + ((yy - c[1]) / radii[1]) ** 2
                + ((xx - c[2]) / radii[2]) ** 2
            )
            lesion |= q < 1.0
        # nested-class maps stay sphere-based (multi-class tests use
        # easy mode); hard mode is binary
        mask = lesion.astype(np.float32)
    elif n_classes >= 2:
        mask = np.zeros(shape, np.float32)
        fracs = np.linspace(1.0, 0.35, n_classes - 1)
        for c, f in enumerate(fracs, start=1):
            mask[dist < radius * f] = c
    else:
        mask = (dist < radius).astype(np.float32)

    # one modality with a near-invisible lesion (hard mode)
    weak = (
        set(rng.choice(n_modalities, size=min(1, n_modalities), replace=False))
        if hard else set()
    )
    images = []
    for m in range(n_modalities):
        base = rng.normal(100.0, 10.0)
        if hard:
            # sign fixed PER MODALITY (mpMRI-realistic: lesions are
            # consistently hypo-intense in ADC, hyper-intense in DWI,
            # ...) — a random per-case sign makes the intensity->lesion
            # mapping statistically unlearnable from a small cohort
            # (measured: val Dice collapses to 0 while train loss falls)
            sign = -1.0 if m % 2 == 0 else 1.0
            contrast = rng.uniform(0.2, 0.6) * sign
            if m in weak:
                contrast *= rng.uniform(0.0, 0.15)
            bias = 1.0 + 0.3 * _smooth_field(rng, shape, min(shape) / 4)
            texture = 6.0 * _smooth_field(rng, shape, min(shape) / 8)
            img = (
                base * bias
                + texture
                + contrast * 50.0 * (mask > 0)
                + rng.normal(0, 6.0, size=shape)
            ).astype(np.float32)
        else:
            contrast = rng.uniform(0.5, 2.0)
            img = (
                base
                + contrast * 50.0 * mask
                + rng.normal(0, 5.0, size=shape)
            ).astype(np.float32)
        images.append(img)
    return images, mask


def make_synthetic_dataset(
    root: str,
    n_cases: int = 6,
    data_type: str = "BPH",
    shape: Tuple[int, int, int] = (24, 24, 24),
    modalities: Sequence[str] = DEFAULT_MODALITIES,
    seed: int = 0,
    drop_modalities: Optional[dict] = None,
    drop_labels: Sequence[str] = (),
    spacing: Tuple[float, float, float] = (1.0, 1.0, 1.5),
    n_classes: int = 1,
    difficulty: str = "easy",
) -> list:
    """Write a synthetic data tree; returns the case IDs written.

    Args:
      drop_modalities: {case_id: [modality, ...]} files to omit (exercises
        missing-modality strategies).
      drop_labels: case IDs whose label file is omitted (exercises the
        label-presence filter).
      n_classes: >= 2 writes integer class-map labels (nested spheres,
        values 0..n_classes-1) for the multi-class path.
      difficulty: "easy" (pipeline tests) or "hard" (low-contrast
        irregular lesions for recipe-efficacy benchmarks — see
        :func:`make_case`).
    """
    drop_modalities = drop_modalities or {}
    rng = np.random.default_rng(seed)
    case_ids = [f"case{i:03d}" for i in range(n_cases)]

    for m in modalities:
        os.makedirs(os.path.join(root, "BPH-PCA", data_type, m), exist_ok=True)
    os.makedirs(os.path.join(root, "BPH-PCA", LABEL_DIR, data_type), exist_ok=True)

    for cid in case_ids:
        images, mask = make_case(
            rng, shape, len(modalities), n_classes, difficulty=difficulty
        )
        for m, img in zip(modalities, images):
            if m in drop_modalities.get(cid, []):
                continue
            vol = Volume(img, spacing=spacing, origin=(1.0, 2.0, 3.0))
            write_nifti(vol, os.path.join(root, "BPH-PCA", data_type, m, cid + ".nii.gz"))
        if cid not in drop_labels:
            lab = Volume(mask.astype(np.uint8), spacing=spacing, origin=(1.0, 2.0, 3.0))
            write_nifti(
                lab,
                os.path.join(root, "BPH-PCA", LABEL_DIR, data_type, cid + ".nii.gz"),
            )
    return case_ids
