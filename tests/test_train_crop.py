"""Patch training (config.train_crop): host random_crop, on-device
device_random_crop, config validation, and a tiny end-to-end run."""

import jax
import numpy as np
import pytest

from pcmseg_tpu.core.config import get_config
from pcmseg_tpu.data.augment import Augmenter, random_crop
from pcmseg_tpu.data.device_cache import device_random_crop


def coord_volume(shape=(12, 16, 16)):
    """Image whose channel 0 encodes the flat voxel coordinate, label
    encoding the same — so crop alignment is checkable voxel-by-voxel."""
    d, h, w = shape
    coords = np.arange(d * h * w, dtype=np.float32).reshape(d, h, w)
    image = np.stack([coords, coords * 2.0], axis=-1)
    label = coords[..., None]
    return image, label


def test_host_random_crop_shape_bounds_alignment():
    image, label = coord_volume()
    rng = np.random.default_rng(0)
    for _ in range(10):
        img, lab = random_crop(image, label, rng, (4, 8, 8))
        assert img.shape == (4, 8, 8, 2)
        assert lab.shape == (4, 8, 8, 1)
        # shared offset: label must equal image channel 0 everywhere
        np.testing.assert_array_equal(lab[..., 0], img[..., 0])
        # contiguous subcube: coordinate deltas match the parent strides
        assert img[1, 0, 0, 0] - img[0, 0, 0, 0] == 16 * 16
        assert img[0, 1, 0, 0] - img[0, 0, 0, 0] == 16


def test_host_random_crop_deterministic_and_covers_offsets():
    image, label = coord_volume()
    a = random_crop(image, label, np.random.default_rng(7), (4, 8, 8))
    b = random_crop(image, label, np.random.default_rng(7), (4, 8, 8))
    np.testing.assert_array_equal(a[0], b[0])
    # different draws eventually hit different offsets
    firsts = {
        float(
            random_crop(image, label, np.random.default_rng(i), (4, 8, 8))[0][
                0, 0, 0, 0
            ]
        )
        for i in range(20)
    }
    assert len(firsts) > 1


def test_augmenter_crop_only_leaves_intensities_alone():
    image, label = coord_volume()
    aug = Augmenter(seed=0, flip=False, rot90=False, intensity_jitter=0.0,
                    crop=(4, 8, 8))
    out = aug({"image": image, "label": label, "case_id": "x"}, 0, 0)
    assert out["image"].shape == (4, 8, 8, 2)
    np.testing.assert_array_equal(out["label"][..., 0], out["image"][..., 0])


def test_device_random_crop_alignment_and_variation():
    image, label = coord_volume()
    images = np.stack([image, image])  # (2,12,16,16,2)
    labels = np.stack([label, label])
    out_i, out_l = device_random_crop(
        images, labels, jax.random.key(0), (4, 8, 8)
    )
    assert out_i.shape == (2, 4, 8, 8, 2)
    assert out_l.shape == (2, 4, 8, 8, 1)
    out_i, out_l = np.asarray(out_i), np.asarray(out_l)
    np.testing.assert_array_equal(out_l[..., 0], out_i[..., 0])
    for b in range(2):
        assert out_i[b, 1, 0, 0, 0] - out_i[b, 0, 0, 0, 0] == 16 * 16
    # per-sample keys: identical inputs generally land on different offsets
    outs = {
        float(
            np.asarray(
                device_random_crop(
                    images, labels, jax.random.key(k), (4, 8, 8)
                )[0]
            )[0, 0, 0, 0, 0]
        )
        for k in range(10)
    }
    assert len(outs) > 1


def sparse_fg_volume(shape=(12, 16, 16), voxel=(10, 2, 13)):
    """Label with a single foreground voxel — a uniform (4,8,8) crop of
    (12,16,16) contains it with probability (4·7·4)/(9·9·9) ≈ 15%, so
    20 all-hit draws under oversample_fg=1.0 are conclusive."""
    image = np.random.default_rng(3).normal(
        size=shape + (2,)
    ).astype(np.float32)
    label = np.zeros(shape + (1,), dtype=np.float32)
    label[voxel] = 1.0
    return image, label


def test_host_oversample_fg_always_contains_foreground():
    image, label = sparse_fg_volume()
    rng = np.random.default_rng(0)
    for _ in range(20):
        img, lab = random_crop(image, label, rng, (4, 8, 8),
                               oversample_fg=1.0)
        assert lab.sum() == 1.0
        assert img.shape == (4, 8, 8, 2)
    # p=0 keeps the plain uniform behavior: some crops miss the voxel
    misses = sum(
        random_crop(image, label, np.random.default_rng(i), (4, 8, 8),
                    oversample_fg=0.0)[1].sum() == 0.0
        for i in range(20)
    )
    assert misses > 0


def test_host_oversample_fg_empty_label_falls_back_uniform():
    image, label = coord_volume()
    empty = np.zeros_like(label)
    rng = np.random.default_rng(1)
    img, lab = random_crop(image, empty, rng, (4, 8, 8), oversample_fg=1.0)
    assert img.shape == (4, 8, 8, 2) and lab.sum() == 0.0


def test_device_oversample_fg_always_contains_foreground():
    image, label = sparse_fg_volume()
    images = np.stack([image] * 4)
    labels = np.stack([label] * 4)

    crop_fn = jax.jit(
        lambda i, l, k: device_random_crop(i, l, k, (4, 8, 8),
                                           oversample_fg=1.0, mode="window")
    )
    hit_everywhere = True
    offsets = set()
    for k in range(5):
        out_i, out_l = crop_fn(images, labels, jax.random.key(k))
        out_l = np.asarray(out_l)
        hit_everywhere &= bool((out_l.sum(axis=(1, 2, 3, 4)) == 1.0).all())
        # fg-biased offsets still vary within the window around the voxel
        out_i = np.asarray(out_i)
        offsets.update(float(v) for v in out_i[:, 0, 0, 0, 0])
    assert hit_everywhere
    assert len(offsets) > 1
    # empty labels fall back to uniform offsets (and never NaN/crash)
    out_i, out_l = jax.jit(
        lambda i, l, k: device_random_crop(i, l, k, (4, 8, 8),
                                           oversample_fg=1.0, mode="window")
    )(images, np.zeros_like(labels), jax.random.key(0))
    assert np.asarray(out_l).sum() == 0.0
    assert np.isfinite(np.asarray(out_i)).all()


def _center_expected_pos(voxel, dims, crop):
    """Where the fg voxel must land inside a CENTERED crop: offset =
    clip(v - c//2, 0, s - c), position = v - offset."""
    return tuple(
        v - int(np.clip(v - c // 2, 0, max(s - c, 0)))
        for v, s, c in zip(voxel, dims, crop)
    )


def test_device_oversample_center_is_nnunet_semantics():
    """'center' mode (the default): every forced sample's crop is
    CENTERED on the sampled foreground voxel (clipped at bounds), and
    the forced count per batch is the DETERMINISTIC nnU-Net fraction
    B - round(B*(1-p)) — not a Bernoulli draw."""
    voxel, dims = (10, 2, 13), (12, 16, 16)
    image, label = sparse_fg_volume(dims, voxel)
    images, labels = np.stack([image] * 4), np.stack([label] * 4)
    crop = (4, 8, 8)
    exp = _center_expected_pos(voxel, dims, crop)

    # p=1: every sample forced, voxel at the exact centered position
    out_i, out_l = jax.jit(
        lambda i, l, k: device_random_crop(i, l, k, crop, oversample_fg=1.0)
    )(images, labels, jax.random.key(0))
    out_l = np.asarray(out_l)
    for s in range(4):
        assert out_l[s].sum() == 1.0
        assert tuple(np.argwhere(out_l[s, ..., 0])[0]) == exp

    # p=0.5 over B=4: n_forced = 4 - round(2) = 2 — the SAME two head
    # positions are forced under every key (deterministic fraction)
    crop_fn = jax.jit(
        lambda i, l, k: device_random_crop(i, l, k, crop, oversample_fg=0.5)
    )
    for k in range(6):
        _, out_l = crop_fn(images, labels, jax.random.key(k))
        out_l = np.asarray(out_l)
        hits = out_l.sum(axis=(1, 2, 3, 4))
        assert hits[0] == 1.0 and hits[1] == 1.0, hits
        for s in (0, 1):
            assert tuple(np.argwhere(out_l[s, ..., 0])[0]) == exp


def test_host_oversample_center_centers_crop():
    voxel, dims = (10, 2, 13), (12, 16, 16)
    image, label = sparse_fg_volume(dims, voxel)
    exp = _center_expected_pos(voxel, dims, (4, 8, 8))
    rng = np.random.default_rng(0)
    for _ in range(10):
        _, lab = random_crop(image, label, rng, (4, 8, 8),
                             oversample_fg=1.0, mode="center")
        assert lab.sum() == 1.0
        assert tuple(np.argwhere(lab[..., 0])[0]) == exp


def test_oversample_fg_config_validation():
    cfg = get_config("standard", target_size=(32, 32, 32),
                     train_crop=(16, 16, 16), oversample_fg=0.33)
    assert cfg.oversample_fg == 0.33
    with pytest.raises(ValueError):
        get_config("standard", oversample_fg=1.5)
    with pytest.raises(ValueError):
        get_config("standard", oversample_fg=-0.1)


def test_config_validation():
    cfg = get_config("standard", target_size=(32, 32, 32),
                     train_crop=(16, 16, 16))
    assert cfg.train_crop == (16, 16, 16)
    # full-size crop is a no-op and normalizes to None
    cfg = get_config("standard", target_size=(32, 32, 32),
                     train_crop=(32, 32, 32))
    assert cfg.train_crop is None
    with pytest.raises(ValueError):
        get_config("standard", target_size=(32, 32, 32),
                   train_crop=(64, 16, 16))
    with pytest.raises(ValueError):
        get_config("standard", train_crop=(16, 16))
    # below the model's 16-voxel minimum (4 poolings -> empty bottleneck)
    with pytest.raises(ValueError):
        get_config("standard", target_size=(32, 32, 32),
                   train_crop=(8, 16, 16))
    with pytest.raises(ValueError):
        get_config("standard", target_size=(12, 32, 32))


@pytest.mark.slow
def test_trainer_with_crop_trains_and_validates_full_size(tmp_path):
    """Patch-trained runs go through both input paths (the tiny cohort
    fits the device cache, so the crop happens in the jitted step) and
    still validate at full target_size."""
    from pcmseg_tpu.data.synthetic import make_synthetic_dataset
    from pcmseg_tpu.train.trainer import Trainer

    root = str(tmp_path / "data")
    make_synthetic_dataset(root, n_cases=6, shape=(20, 20, 20), seed=5)
    config = get_config(
        "standard",
        data_dir=root,
        save_dir=str(tmp_path / "ckpt"),
        base_features=4,
        remat=False,
        compute_dtype="float32",
        target_size=(20, 20, 20),
        train_crop=(16, 16, 16),
        oversample_fg=0.33,
        batch_size=2,
        num_epochs=2,
        val_fraction=0.34,
        early_stopping=False,
        save_frequency=0,
    )
    trainer = Trainer(config)
    history = trainer.train()
    assert np.isfinite(history["train_loss"]).all()
    assert np.isfinite(history["val_loss"]).all()

    # streamed path too (device cache off -> host Augmenter crops)
    config2 = get_config(
        "standard",
        data_dir=root,
        save_dir=str(tmp_path / "ckpt2"),
        base_features=4,
        remat=False,
        compute_dtype="float32",
        target_size=(20, 20, 20),
        train_crop=(16, 16, 16),
        oversample_fg=0.33,
        batch_size=2,
        num_epochs=1,
        val_fraction=0.34,
        early_stopping=False,
        save_frequency=0,
        device_data_cache_gb=0.0,
    )
    history2 = Trainer(config2).train()
    assert np.isfinite(history2["train_loss"]).all()
