"""CLI flag surface → Config mapping (no device work)."""

import pytest

from pcmseg_tpu.cli.main import _config_from_args, build_parser


def parse(argv):
    return build_parser().parse_args(argv)


def test_train_flag_surface_maps_to_config():
    args = parse(
        [
            "train",
            "--data_dir", "/d",
            "--data_type", "PCA",
            "--preset", "high_performance",
            "--epochs", "42",
            "--batch_size", "3",
            "--learning_rate", "2e-4",
            "--missing_strategy", "duplicate",
            "--target_size", "96", "96", "96",
            "--base_features", "32",
            "--save_dir", "/ckpt",
            "--loss", "bce_dice",
            "--normalize", "zscore",
            "--norm_layer", "group",
            "--no_validation",
            "--resume",
            "--n_splits", "7",
            "--seed", "7",
        ]
    )
    c = _config_from_args(args, preset=args.preset)
    assert c.data_dir == "/d" and c.data_type == "PCA"
    assert c.num_epochs == 42 and c.batch_size == 3
    assert c.learning_rate == 2e-4
    assert c.missing_strategy == "duplicate"
    assert c.target_size == (96, 96, 96) and c.base_features == 32
    assert c.save_dir == "/ckpt" and c.loss == "bce_dice"
    assert c.normalize == "zscore" and c.norm_layer == "group"
    assert c.validation is False and c.resume is True
    assert c.n_splits == 7 and c.seed == 7
    # non-overridden preset values survive
    assert c.patience == 20  # high_performance


def test_predict_flags():
    args = parse(
        [
            "predict",
            "--model_path", "/m",
            "--input_dir", "/case",
            "--sliding_window",
            "--window_size", "64", "64", "64",
            "--window_overlap", "0.25",
            "--threshold", "0.7",
        ]
    )
    c = _config_from_args(args)
    assert c.sliding_window is True
    assert c.window_size == (64, 64, 64)
    assert c.window_overlap == 0.25
    assert c.threshold == 0.7


def test_reference_compat_flags_accepted():
    # the reference CLI's --optimized / --cross_validation surface
    args = parse(["train", "--optimized", "--cross_validation"])
    assert args.optimized is True and args.cross_validation is True
    args2 = parse(["train", "--data_augmentation", "--interactive"])
    assert args2.data_augmentation is True and args2.interactive is True


def test_round2_train_flags_map_to_config():
    args = parse(
        [
            "train",
            "--async_checkpoint",
            "--remat", "1",
            "--profile", "/tmp/trace",
            "--profile_steps", "7",
        ]
    )
    c = _config_from_args(args, preset=args.preset)
    assert c.async_checkpoint is True
    assert c.remat is True
    assert c.profile_dir == "/tmp/trace" and c.profile_steps == 7
    # --remat 0 forces remat OFF even where the preset enables it
    c0 = _config_from_args(parse(["train", "--remat", "0"]), preset="standard")
    assert c0.remat is False


def test_window_blend_flag():
    args = parse(
        ["predict", "--model_path", "/m", "--input_dir", "/c",
         "--window_blend", "uniform"]
    )
    assert _config_from_args(args).window_blend == "uniform"
    with pytest.raises(SystemExit):
        parse(["predict", "--model_path", "/m", "--input_dir", "/c",
               "--window_blend", "bogus"])


def test_invalid_choices_rejected():
    with pytest.raises(SystemExit):
        parse(["train", "--data_type", "XXX"])
    with pytest.raises(SystemExit):
        parse(["train", "--missing_strategy", "bogus"])
    with pytest.raises(SystemExit):
        parse(["bogus_command"])
    with pytest.raises(SystemExit):
        parse(["validate"])  # --model_path required
