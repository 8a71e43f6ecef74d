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

from typing import Dict, Optional, Tuple

import numpy as np


def augment_sample(
    image: np.ndarray,
    label: np.ndarray,
    rng: np.random.Generator,
    flip: bool = True,
    rot90: bool = True,
    intensity_jitter: float = 0.1,
    scale: float = 0.0,
    rotate_deg: float = 0.0,
    gamma: float = 0.0,
    noise: float = 0.0,
    blur_prob: float = 0.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Augment one ((D,H,W,C), (D,H,W,1)) pair; returns new arrays.

    The extended transforms (scale / rotate_deg / gamma / noise /
    blur_prob, all default-off) are the host twins of
    device_cache.device_augment's nnU-Net-style set, implemented with
    scipy (affine zoom+rotation: linear image / nearest label;
    distributions match the device path — same config keys drive both).
    """
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
    if scale > 0 or rotate_deg > 0:
        from scipy import ndimage

        ang = rng.uniform(-rotate_deg, rotate_deg) if rotate_deg > 0 else 0.0
        zoom = 1.0 + (rng.uniform(-scale, scale) if scale > 0 else 0.0)
        rad = np.deg2rad(ang)
        cos, sin = np.cos(rad), np.sin(rad)
        # inverse map (output -> source): rotate by -ang in H-W, zoom 1/z
        mat = np.array(
            [[1.0, 0.0, 0.0], [0.0, cos, sin], [0.0, -sin, cos]], np.float64
        ) / zoom
        center = (np.asarray(image.shape[:3]) - 1) / 2.0
        offset = center - mat @ center
        img32 = np.ascontiguousarray(image, dtype=np.float32)
        out = np.empty_like(img32)
        for c in range(image.shape[-1]):
            ndimage.affine_transform(
                img32[..., c], mat, offset=offset, order=1,
                mode="nearest", output=out[..., c],
            )
        image = out
        label = ndimage.affine_transform(
            np.ascontiguousarray(label[..., 0]), mat, offset=offset,
            order=0, mode="nearest",
        )[..., None].astype(label_dtype)
    if intensity_jitter > 0:
        sc = 1.0 + rng.uniform(-intensity_jitter, intensity_jitter)
        shift = rng.uniform(-intensity_jitter, intensity_jitter) * float(
            image.astype(np.float32).std() or 1.0
        )
        image = image * sc + shift
    if gamma > 0:
        g = float(np.exp(rng.uniform(-gamma, gamma)))
        x = image.astype(np.float32)
        lo, hi = float(x.min()), float(x.max())
        span = max(hi - lo, 1e-6)
        image = np.power((x - lo) / span, g) * span + lo
    if noise > 0:
        sigma = rng.uniform(0, noise) * max(
            float(image.astype(np.float32).std()), 1e-6
        )
        image = image + rng.normal(0, sigma, size=image.shape)
    if blur_prob > 0 and rng.random() < blur_prob:
        from scipy import ndimage

        sigma = rng.uniform(0.5, 1.1)
        x = np.ascontiguousarray(image, dtype=np.float32)
        for c in range(image.shape[-1]):
            x[..., c] = ndimage.gaussian_filter(x[..., c], sigma)
        image = x
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
    fg_flat: Optional[np.ndarray] = None,
    mode: str = "center",
) -> Tuple[np.ndarray, np.ndarray]:
    """Crop one ((D,H,W,C), (D,H,W,1)) pair to ``crop`` at a shared
    uniform-random offset (nnU-Net-inspired patch sampling, config
    ``train_crop``). With probability ``oversample_fg`` the offset is
    instead chosen so the crop contains a uniformly-drawn foreground
    voxel — small lesions are otherwise missed by most uniform crops.
    ``mode='center'`` places the crop CENTERED on the voxel (nnU-Net's
    placement); ``'window'`` (the round-4 variant) puts it uniformly
    anywhere inside the crop window. Forcing here is per-sample
    Bernoulli either way: this host twin runs per sample inside the
    streamed loader with no batch context, so nnU-Net's deterministic
    per-BATCH fraction exists only on the device-cached path
    (device_cache.device_random_crop) — same rate, different variance.
    Falls back to uniform when the case has no foreground. No-op when
    already at or below the crop size.

    ``fg_flat`` optionally supplies the precomputed flat indices of the
    label's foreground voxels (``np.flatnonzero(label[..., 0])``) so
    per-epoch callers avoid the O(volume) rescan every draw (ADVICE
    round-3 #1); when None it is computed here."""
    dims = image.shape[:3]
    offsets = None
    if oversample_fg > 0.0 and rng.random() < oversample_fg:
        if fg_flat is None:
            fg_flat = np.flatnonzero(label[..., 0] > 0)
        if fg_flat.shape[0]:
            v = np.unravel_index(
                int(fg_flat[int(rng.integers(0, fg_flat.shape[0]))]), dims
            )
            offsets = []
            for vi, s, c in zip(v, dims, crop):
                if mode == "center":
                    offsets.append(
                        int(np.clip(int(vi) - c // 2, 0, max(s - c, 0)))
                    )
                    continue
                # window: o must satisfy o <= vi < o + c, clipped to range
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
        oversample_mode: str = "center",
        scale: float = 0.0,
        rotate_deg: float = 0.0,
        gamma: float = 0.0,
        noise: float = 0.0,
        blur_prob: float = 0.0,
    ):
        self.seed = seed
        self.flip = flip
        self.rot90 = rot90
        self.intensity_jitter = intensity_jitter
        self.scale = float(scale)
        self.rotate_deg = float(rotate_deg)
        self.gamma = float(gamma)
        self.noise = float(noise)
        self.blur_prob = float(blur_prob)
        self.crop = tuple(crop) if crop else None
        self.oversample_fg = float(oversample_fg)
        self.oversample_mode = oversample_mode
        # per-case foreground flat-index cache for oversample_fg: the crop
        # runs on the UNaugmented full-size label, which is deterministic
        # per case, so the O(volume) foreground scan happens once per case
        # instead of once per draw (ADVICE round-3 #1). Flat int indices
        # (not (N,3) coords): 4 bytes/voxel, bounded entry count.
        self._fg_cache: Dict[object, np.ndarray] = {}
        self._fg_cache_max = 512

    def _fg_indices(self, key, label: np.ndarray) -> np.ndarray:
        got = self._fg_cache.get(key)
        if got is None:
            got = np.flatnonzero(label[..., 0] > 0).astype(np.int64)
            if len(self._fg_cache) >= self._fg_cache_max:
                self._fg_cache.pop(next(iter(self._fg_cache)))
            self._fg_cache[key] = got
        return got

    def __call__(
        self, sample: Dict[str, np.ndarray], epoch: int, index: int
    ) -> Dict[str, np.ndarray]:
        rng = np.random.default_rng((self.seed, epoch, index))
        image, label = sample["image"], sample["label"]
        if self.crop is not None:
            fg = (
                self._fg_indices(sample.get("case_id", index), label)
                if self.oversample_fg > 0.0
                else None
            )
            # crop first: the spatial/intensity augs then touch ~(c/t)³
            # fewer voxels
            image, label = random_crop(
                image, label, rng, self.crop, self.oversample_fg,
                fg_flat=fg, mode=self.oversample_mode,
            )
        image, label = augment_sample(
            image,
            label,
            rng,
            flip=self.flip,
            rot90=self.rot90,
            intensity_jitter=self.intensity_jitter,
            scale=self.scale,
            rotate_deg=self.rotate_deg,
            gamma=self.gamma,
            noise=self.noise,
            blur_prob=self.blur_prob,
        )
        return {**sample, "image": image, "label": label}
