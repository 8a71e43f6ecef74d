import json

import pytest

from pcmseg_tpu.core.config import Config, get_config, PRESETS


def test_preset_names_match_reference():
    # test/config_example.py:149-155 defines exactly these five presets
    assert set(PRESETS) == {
        "quick",
        "standard",
        "cross_validation",
        "high_performance",
        "small_dataset",
    }


def test_standard_defaults():
    c = get_config("standard")
    assert c.num_epochs == 100
    assert c.batch_size == 1
    assert c.learning_rate == 1e-4
    assert c.patience == 15
    assert c.weight_decay == 1e-5
    assert c.dice_smooth == 1.0
    assert c.plateau_factor == 0.5 and c.plateau_patience == 10
    assert c.n_classes == 1  # sigmoid-binary everywhere (SURVEY.md §8.4)
    assert c.target_size == (128, 128, 128)
    assert len(c.modalities) == 5 and c.n_modalities == 5


def test_quick_preset():
    c = get_config("quick")
    assert c.num_epochs == 10
    assert c.batch_size == 2
    assert c.validation is False
    assert c.early_stopping is False


def test_high_performance_preset():
    c = get_config("high_performance")
    assert (c.num_epochs, c.batch_size, c.learning_rate, c.patience) == (
        200,
        4,
        5e-5,
        20,
    )


def test_small_dataset_preset():
    c = get_config("small_dataset")
    assert c.n_splits == 10 and c.batch_size == 1


def test_overrides_and_unknown_preset():
    c = get_config("cross_validation", num_epochs=150, n_splits=10)
    assert c.num_epochs == 150 and c.n_splits == 10
    with pytest.raises(ValueError):
        get_config("nope")


def test_validation_errors():
    with pytest.raises(ValueError):
        Config(missing_strategy="bogus")
    with pytest.raises(ValueError):
        Config(data_type="XYZ")
    with pytest.raises(ValueError):
        Config(loss="jaccard_hinge")


def test_json_roundtrip():
    c = get_config("high_performance", data_type="PCA")
    c2 = Config.from_json(c.to_json())
    assert c2 == c
    with pytest.raises(ValueError):
        Config.from_dict({**json.loads(c.to_json()), "bogus_key": 1})
