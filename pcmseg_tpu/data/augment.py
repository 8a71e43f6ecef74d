"""Host-side training augmentation for 3D volumes.

The reference declared an AUGMENTATION_CONFIG that nothing consumed
(SURVEY.md §8.11) and set ``data_augmentation: True`` in its small_dataset
preset; here the flag is load-bearing. Augmentations are cheap, label-safe
spatial ops applied per-sample on the host (the cache stores *unaugmented*
arrays, so augmentation stays fresh every epoch):

  * random flips along each spatial axis (p=0.5 each)
  * random 90° rotations in the H-W plane
  * random intensity scale/shift jitter (images only)

All deterministic under a seed (per-epoch, per-sample derived keys).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def augment_sample(
    image: np.ndarray,
    label: np.ndarray,
    rng: np.random.Generator,
    flip: bool = True,
    rot90: bool = True,
    intensity_jitter: float = 0.1,
) -> Tuple[np.ndarray, np.ndarray]:
    """Augment one ((D,H,W,C), (D,H,W,1)) pair; returns new arrays."""
    image_dtype, label_dtype = image.dtype, label.dtype
    if flip:
        for ax in range(3):
            if rng.random() < 0.5:
                image = np.flip(image, axis=ax)
                label = np.flip(label, axis=ax)
    if rot90:
        k = int(rng.integers(0, 4))
        if image.shape[1] != image.shape[2]:
            # odd k swaps the H/W extents, yielding per-sample ragged shapes
            # that break batch collation; non-square targets only get 180°
            k -= k % 2
        if k:
            image = np.rot90(image, k=k, axes=(1, 2))
            label = np.rot90(label, k=k, axes=(1, 2))
    if intensity_jitter > 0:
        scale = 1.0 + rng.uniform(-intensity_jitter, intensity_jitter)
        shift = rng.uniform(-intensity_jitter, intensity_jitter) * float(
            image.astype(np.float32).std() or 1.0
        )
        image = image * scale + shift
    # preserve the input dtypes: the pipeline's wire format is bf16 image /
    # uint8 label (dataset.load_case) and upcasting here would double the
    # host->device transfer that dominates the epoch
    return (
        np.ascontiguousarray(image).astype(image_dtype, copy=False),
        np.ascontiguousarray(label).astype(label_dtype, copy=False),
    )


def random_crop(
    image: np.ndarray,
    label: np.ndarray,
    rng: np.random.Generator,
    crop: Tuple[int, int, int],
    oversample_fg: float = 0.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Crop one ((D,H,W,C), (D,H,W,1)) pair to ``crop`` at a shared
    uniform-random offset (nnU-Net-style patch sampling, config
    ``train_crop``). With probability ``oversample_fg`` the offset is
    instead chosen so the crop contains a uniformly-drawn foreground
    voxel (nnU-Net oversamples lesion patches the same way — small
    lesions are otherwise missed by most uniform crops). Falls back to
    uniform when the case has no foreground. No-op when already at or
    below the crop size."""
    dims = image.shape[:3]
    offsets = None
    if oversample_fg > 0.0 and rng.random() < oversample_fg:
        fg = np.argwhere(label[..., 0] > 0)
        if fg.shape[0]:
            v = fg[int(rng.integers(0, fg.shape[0]))]
            offsets = []
            for vi, s, c in zip(v, dims, crop):
                # o must satisfy o <= vi < o + c, clipped to valid range
                lo = int(np.clip(int(vi) - c + 1, 0, max(s - c, 0)))
                hi = int(np.clip(int(vi), 0, max(s - c, 0)))
                offsets.append(int(rng.integers(lo, hi + 1)))
    if offsets is None:
        offsets = [
            int(rng.integers(0, s - c + 1)) if s > c else 0
            for s, c in zip(dims, crop)
        ]
    sl = tuple(slice(o, o + c) for o, c in zip(offsets, crop))
    return (
        np.ascontiguousarray(image[sl]),
        np.ascontiguousarray(label[sl]),
    )


class Augmenter:
    """Deterministic per-(epoch, index) augmentation policy."""

    def __init__(
        self,
        seed: int = 0,
        flip: bool = True,
        rot90: bool = True,
        intensity_jitter: float = 0.1,
        crop: Tuple[int, int, int] = None,
        oversample_fg: float = 0.0,
    ):
        self.seed = seed
        self.flip = flip
        self.rot90 = rot90
        self.intensity_jitter = intensity_jitter
        self.crop = tuple(crop) if crop else None
        self.oversample_fg = float(oversample_fg)

    def __call__(
        self, sample: Dict[str, np.ndarray], epoch: int, index: int
    ) -> Dict[str, np.ndarray]:
        rng = np.random.default_rng((self.seed, epoch, index))
        image, label = sample["image"], sample["label"]
        if self.crop is not None:
            # crop first: the spatial/intensity augs then touch ~(c/t)³
            # fewer voxels
            image, label = random_crop(
                image, label, rng, self.crop, self.oversample_fg
            )
        image, label = augment_sample(
            image,
            label,
            rng,
            flip=self.flip,
            rot90=self.rot90,
            intensity_jitter=self.intensity_jitter,
        )
        return {**sample, "image": image, "label": label}
