"""Augmentation: label-safety, determinism, loader wiring."""

import numpy as np

from pcmseg_tpu.data.augment import Augmenter, augment_sample


def _sample(rng, size=8):
    image = rng.normal(size=(size, size, size, 5)).astype(np.float32)
    label = (rng.random((size, size, size, 1)) > 0.7).astype(np.float32)
    return image, label


def test_flips_and_rots_keep_label_binary_and_count(rng):
    image, label = _sample(rng)
    n_pos = label.sum()
    out_img, out_lab = augment_sample(
        image, label, np.random.default_rng(1), intensity_jitter=0.0
    )
    assert out_lab.sum() == n_pos  # spatial ops preserve voxel counts
    assert set(np.unique(out_lab)) <= {0.0, 1.0}
    assert out_img.shape == image.shape


def test_geometry_applied_identically_to_image_and_label(rng):
    # make label == thresholded channel 0 so alignment is checkable
    image, _ = _sample(rng)
    label = (image[..., :1] > 0).astype(np.float32)
    out_img, out_lab = augment_sample(
        image, label, np.random.default_rng(3), intensity_jitter=0.0
    )
    np.testing.assert_array_equal((out_img[..., :1] > 0).astype(np.float32), out_lab)


def test_deterministic_per_epoch_index(rng):
    image, label = _sample(rng)
    aug = Augmenter(seed=5)
    a = aug({"image": image, "label": label, "case_id": "x"}, epoch=2, index=3)
    b = aug({"image": image, "label": label, "case_id": "x"}, epoch=2, index=3)
    np.testing.assert_array_equal(a["image"], b["image"])
    c = aug({"image": image, "label": label, "case_id": "x"}, epoch=3, index=3)
    assert not np.array_equal(a["image"], c["image"])


def test_intensity_jitter_touches_image_not_label(rng):
    image, label = _sample(rng)
    out_img, out_lab = augment_sample(
        image, label, np.random.default_rng(0),
        flip=False, rot90=False, intensity_jitter=0.5,
    )
    assert not np.array_equal(out_img, image)
    np.testing.assert_array_equal(out_lab, label)


def test_loader_applies_augmenter(tmp_path, rng):
    from pcmseg_tpu.data.dataset import ProstateDataset
    from pcmseg_tpu.data.loader import DataLoader
    from pcmseg_tpu.data.synthetic import make_synthetic_dataset

    root = str(tmp_path / "aug_data")
    make_synthetic_dataset(root, n_cases=2, shape=(12, 12, 12))
    ds = ProstateDataset(root, target_size=(16, 16, 16))
    plain = DataLoader(ds, batch_size=2, shuffle=False, num_workers=1)
    auged = DataLoader(
        ds, batch_size=2, shuffle=False, num_workers=1, augmenter=Augmenter(seed=1)
    )
    b0 = next(iter(plain))
    b1 = next(iter(auged))
    assert not np.array_equal(b0["image"], b1["image"])
    assert b0["image"].shape == b1["image"].shape


def test_rot90_non_cubic_keeps_shape():
    """Non-square H-W targets restrict rot90 to 180° (no ragged shapes)."""
    import numpy as np

    from pcmseg_tpu.data.augment import augment_sample

    image = np.zeros((8, 10, 12, 5), np.float32)
    label = np.zeros((8, 10, 12, 1), np.float32)
    for seed in range(20):
        rng = np.random.default_rng(seed)
        img, lab = augment_sample(image, label, rng, flip=False, rot90=True,
                                  intensity_jitter=0.0)
        assert img.shape == image.shape and lab.shape == label.shape


def test_random_crop_fg_flat_cache_equivalent(rng):
    """The precomputed foreground-index fast path (ADVICE round-3 #1)
    must draw exactly the same crops as the inline O(volume) scan."""
    from pcmseg_tpu.data.augment import random_crop

    img = rng.normal(size=(12, 12, 12, 2)).astype(np.float32)
    lab = (rng.random((12, 12, 12, 1)) > 0.8).astype(np.uint8)
    fg = np.flatnonzero(lab[..., 0] > 0)
    for seed in range(6):
        a_i, a_l = random_crop(
            img, lab, np.random.default_rng(seed), (6, 6, 6),
            oversample_fg=1.0,
        )
        b_i, b_l = random_crop(
            img, lab, np.random.default_rng(seed), (6, 6, 6),
            oversample_fg=1.0, fg_flat=fg,
        )
        np.testing.assert_array_equal(a_i, b_i)
        np.testing.assert_array_equal(a_l, b_l)
        assert a_l.sum() > 0  # forced-foreground crop contains fg


def test_augmenter_caches_fg_indices(tmp_path, rng):
    from pcmseg_tpu.data.augment import Augmenter

    aug = Augmenter(seed=0, crop=(6, 6, 6), oversample_fg=1.0)
    img = rng.normal(size=(12, 12, 12, 2)).astype(np.float32)
    lab = (rng.random((12, 12, 12, 1)) > 0.8).astype(np.uint8)
    sample = {"image": img, "label": lab, "case_id": "c0"}
    out1 = aug(sample, epoch=0, index=0)
    assert "c0" in aug._fg_cache
    cached = aug._fg_cache["c0"]
    out2 = aug(sample, epoch=0, index=0)
    assert aug._fg_cache["c0"] is cached  # reused, not recomputed
    np.testing.assert_array_equal(out1["label"], out2["label"])
