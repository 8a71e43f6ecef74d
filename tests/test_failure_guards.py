"""Failure-detection behavior: NaN-loss abort, unreadable-case resilience."""

import pytest

# compile-heavy on a 1-core host (measured; see pyproject's marker
# registration) - excluded from the quick lane `pytest -m 'not slow'`
pytestmark = pytest.mark.slow

import numpy as np
import pytest

from pcmseg_tpu.core.config import get_config
from pcmseg_tpu.data.synthetic import make_synthetic_dataset


def test_nan_loss_aborts_training(tmp_path, monkeypatch):
    """A poisoned batch must abort with FloatingPointError, not train on."""
    from pcmseg_tpu.train import trainer as trainer_mod

    root = str(tmp_path / "data")
    make_synthetic_dataset(root, n_cases=2, shape=(12, 12, 12))
    config = get_config(
        "quick",
        data_dir=root,
        save_dir=str(tmp_path / "ckpt"),
        base_features=4,
        remat=False,
        compute_dtype="float32",
        target_size=(16, 16, 16),
        batch_size=2,
        num_epochs=1,
        validation=False,
        early_stopping=False,
        # pin the STREAMING path: the poisoning hook below patches
        # _train_step, which the device-cached epoch doesn't use (the
        # cached path's identical guard is tested separately below)
        device_data_cache_gb=0.0,
    )
    t = trainer_mod.Trainer(config)
    assert t._dcache is None

    real_step = t._train_step

    def poisoned_step(state, batch):
        poisoned = dict(batch)
        poisoned["image"] = batch["image"] * np.nan
        return real_step(state, poisoned)

    t._train_step = poisoned_step
    with pytest.raises(FloatingPointError):
        t.train()


def test_nan_loss_aborts_training_cached(tmp_path, monkeypatch):
    """The device-cached epoch has the same non-finite-loss abort."""
    from pcmseg_tpu.train import trainer as trainer_mod

    root = str(tmp_path / "data")
    make_synthetic_dataset(root, n_cases=2, shape=(12, 12, 12))
    config = get_config(
        "quick",
        data_dir=root,
        save_dir=str(tmp_path / "ckpt"),
        base_features=4,
        remat=False,
        compute_dtype="float32",
        target_size=(16, 16, 16),
        batch_size=2,
        num_epochs=1,
        validation=False,
        early_stopping=False,
        data_parallel=1,
        device_data_cache_gb=1.0,
    )
    t = trainer_mod.Trainer(config)
    assert t._dcache is not None

    real_step = t._cached_train_step

    def poisoned_step(state, images, labels, idx, weights, key):
        return real_step(
            state, images * np.float32(np.nan), labels, idx, weights, key
        )

    t._cached_train_step = poisoned_step
    with pytest.raises(FloatingPointError):
        t.train()


def test_unreadable_label_case_skipped_not_fatal(tmp_path):
    import os

    from pcmseg_tpu.data.dataset import ProstateDataset

    root = str(tmp_path / "data")
    make_synthetic_dataset(root, n_cases=3, shape=(10, 10, 10))
    victim = os.path.join(
        root, "BPH-PCA", "ROI(BPH+PCA)", "BPH", "case001.nii.gz"
    )
    open(victim, "wb").write(b"corrupted")
    ds = ProstateDataset(root, target_size=(12, 12, 12))
    assert ds.case_ids == ["case000", "case002"]
