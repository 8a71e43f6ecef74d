"""Dataset discovery / filtering / strategies / caching on synthetic trees."""

import os

import numpy as np
import pytest

from pcmseg_tpu.data.dataset import ProstateDataset
from pcmseg_tpu.data.kfold import get_kfold_splits, kfold_indices
from pcmseg_tpu.data.loader import DataLoader, get_dataloader
from pcmseg_tpu.data.synthetic import make_synthetic_dataset

SHAPE = (12, 12, 12)
TARGET = (16, 16, 16)


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("data"))
    make_synthetic_dataset(
        root,
        n_cases=6,
        data_type="BPH",
        shape=SHAPE,
        drop_modalities={"case002": ["DWI"], "case003": ["DWI", "T2 fs"]},
        drop_labels=["case005"],
    )
    return root


def test_scan_and_label_filter(data_root):
    ds = ProstateDataset(data_root, target_size=TARGET)
    # case005 has no label → dropped; others kept (zero_fill keeps missing)
    assert ds.case_ids == ["case000", "case001", "case002", "case003", "case004"]


def test_skip_strategy_drops_incomplete_cases(data_root):
    ds = ProstateDataset(data_root, missing_strategy="skip", target_size=TARGET)
    assert ds.case_ids == ["case000", "case001", "case004"]


def test_zero_fill_produces_zero_channel(data_root):
    ds = ProstateDataset(data_root, missing_strategy="zero_fill", target_size=TARGET)
    idx = ds.case_ids.index("case002")
    sample = ds[idx]
    assert sample["image"].shape == TARGET + (5,)
    assert sample["label"].shape == TARGET + (1,)
    # DWI is channel 1 in the default modality order
    assert np.all(sample["image"][..., 1] == 0)
    assert np.any(sample["image"][..., 0] != 0)


def test_duplicate_strategy_copies_first_available(data_root):
    ds = ProstateDataset(data_root, missing_strategy="duplicate", target_size=TARGET)
    idx = ds.case_ids.index("case002")
    sample = ds[idx]
    # DWI (missing) duplicated from ADC (first available)
    np.testing.assert_array_equal(sample["image"][..., 1], sample["image"][..., 0])


def test_label_binarized_and_image_normalized(data_root):
    ds = ProstateDataset(data_root, target_size=TARGET, normalize="percentile")
    s = ds[0]
    assert set(np.unique(s["label"])) <= {0.0, 1.0}
    assert s["label"].sum() > 0  # sphere survived resampling
    assert 0.0 <= s["image"].min() and s["image"].max() <= 1.0


def test_unreadable_file_dropped_at_filter(data_root, tmp_path):
    # corrupt one modality file of case004 in a copied tree
    import shutil

    root = str(tmp_path / "copy")
    shutil.copytree(data_root, root)
    victim = os.path.join(root, "BPH-PCA", "BPH", "ADC", "case004.nii.gz")
    open(victim, "wb").write(b"garbage!")
    ds = ProstateDataset(root, target_size=TARGET)
    assert "case004" not in ds.case_ids


def test_cache_roundtrip_and_speedup(data_root, tmp_path):
    cache = str(tmp_path / "cache")
    ds = ProstateDataset(data_root, target_size=TARGET, cache_dir=cache)
    first = ds[0]
    files = os.listdir(cache)
    assert len(files) == 1 and files[0].endswith(".npz")
    second = ds[0]
    np.testing.assert_array_equal(first["image"], second["image"])
    np.testing.assert_array_equal(first["label"], second["label"])


def test_empty_tree_yields_empty_dataset(tmp_path):
    ds = ProstateDataset(str(tmp_path), target_size=TARGET)
    assert len(ds) == 0


def test_dataloader_batching_and_partial_batch(data_root):
    loader = get_dataloader(
        data_root, batch_size=2, target_size=TARGET, shuffle=False, num_workers=2
    )
    batches = list(loader)
    assert len(batches) == 3  # 5 cases → 2+2+1
    assert batches[0]["image"].shape == (2, *TARGET, 5)
    assert batches[-1]["image"].shape == (1, *TARGET, 5)
    assert len(loader) == 3
    # drop_last
    loader2 = DataLoader(loader.dataset, batch_size=2, shuffle=False, drop_last=True)
    assert len(list(loader2)) == 2 == len(loader2)


def test_dataloader_shuffle_deterministic_per_seed(data_root):
    ds = ProstateDataset(data_root, target_size=TARGET)
    l1 = DataLoader(ds, batch_size=5, shuffle=True, seed=7, num_workers=1)
    l2 = DataLoader(ds, batch_size=5, shuffle=True, seed=7, num_workers=1)
    b1, b2 = next(iter(l1)), next(iter(l2))
    assert b1["case_id"] == b2["case_id"]
    # second epoch reshuffles
    b1b = next(iter(l1))
    assert b1b["case_id"] != b1["case_id"] or len(set(b1["case_id"])) == 1


def test_dataloader_subset_indices(data_root):
    ds = ProstateDataset(ds_root := data_root, target_size=TARGET)
    loader = DataLoader(ds, batch_size=4, shuffle=False, indices=[0, 2])
    (batch,) = list(loader)
    assert batch["case_id"] == ["case000", "case002"]
    with pytest.raises(IndexError):
        DataLoader(ds, indices=[99])


def test_kfold_over_filtered_cases(data_root):
    splits = get_kfold_splits(data_root, n_splits=5)
    ds = ProstateDataset(data_root, target_size=TARGET)
    n = len(ds)
    for tr, va in splits:
        assert set(tr) | set(va) == set(range(n))
        assert not set(tr) & set(va)
        assert max(tr.max(), va.max()) < n  # never out of range (SURVEY §8.6)


def test_kfold_matches_sklearn_seed42():
    sklearn = pytest.importorskip("sklearn")
    from sklearn.model_selection import KFold

    ours = kfold_indices(17, n_splits=5, seed=42)
    theirs = list(KFold(5, shuffle=True, random_state=42).split(np.arange(17)))
    for (a, b), (c, d) in zip(ours, theirs):
        np.testing.assert_array_equal(a, c)
        np.testing.assert_array_equal(b, d)


def test_kfold_validation():
    with pytest.raises(ValueError):
        kfold_indices(3, n_splits=5)
    with pytest.raises(ValueError):
        kfold_indices(10, n_splits=1)


def test_prefetch_to_device(data_root):
    import jax

    from pcmseg_tpu.data.loader import prefetch_to_device

    loader = get_dataloader(
        data_root, batch_size=2, target_size=TARGET, shuffle=False, num_workers=1
    )
    got = list(prefetch_to_device(iter(loader), size=2))
    assert len(got) == 3
    assert isinstance(got[0]["image"], jax.Array)
    assert got[0]["case_id"] == ["case000", "case001"]


def test_loader_prefetch_window_is_bounded(data_root):
    """The thread pool must not decode the whole epoch ahead of the consumer."""
    import time

    ds = ProstateDataset(data_root, target_size=TARGET)
    loads = []
    orig = ds.load_case

    def tracking_load(i):
        loads.append(i)
        return orig(i)

    ds.load_case = tracking_load
    loader = DataLoader(ds, batch_size=1, shuffle=False, num_workers=2)
    it = iter(loader)
    next(it)  # consume one batch, then give workers a moment
    time.sleep(0.3)
    # window = num_workers+1 = 3 batches in flight + the consumed one;
    # with 5 cases, decoding all of them would mean an unbounded window
    assert len(loads) <= 4, loads
    rest = list(it)
    assert len(rest) == 4  # the remaining batches still arrive
