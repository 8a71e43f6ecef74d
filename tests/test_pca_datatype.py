"""PCA cohort: discovery/strategies work identically to BPH (BASELINE.json
config #3: 'PCA training exercising all missing-modality strategies')."""

import numpy as np
import pytest

from pcmseg_tpu.data.dataset import ProstateDataset
from pcmseg_tpu.data.synthetic import make_synthetic_dataset

TARGET = (16, 16, 16)


@pytest.fixture(scope="module")
def pca_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("pca_data"))
    make_synthetic_dataset(
        root,
        n_cases=5,
        data_type="PCA",
        shape=(12, 12, 12),
        drop_modalities={"case001": ["T2 fs"], "case002": ["ADC", "DWI"]},
    )
    return root


def test_pca_tree_discovered(pca_root):
    ds = ProstateDataset(pca_root, data_type="PCA", target_size=TARGET)
    # case002 is missing ADC — the anchor dir — so it is never discovered
    # (the reference scans case IDs from the ADC dir, data_loader.py:57-94)
    assert ds.case_ids == ["case000", "case001", "case003", "case004"]


def test_pca_bph_do_not_cross_contaminate(pca_root):
    ds = ProstateDataset(pca_root, data_type="BPH", target_size=TARGET)
    assert len(ds) == 0


@pytest.mark.parametrize("strategy", ["zero_fill", "skip", "duplicate"])
def test_pca_all_strategies(pca_root, strategy):
    ds = ProstateDataset(
        pca_root, data_type="PCA", missing_strategy=strategy, target_size=TARGET
    )
    if strategy == "skip":
        assert "case001" not in ds.case_ids
    else:
        idx = ds.case_ids.index("case001")
        s = ds[idx]
        assert s["image"].shape == TARGET + (5,)
        ch = 3  # 'T2 fs' is channel 3
        if strategy == "zero_fill":
            assert np.all(s["image"][..., ch] == 0)
        else:
            np.testing.assert_array_equal(s["image"][..., ch], s["image"][..., 0])
