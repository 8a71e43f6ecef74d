"""End-to-end: synthetic NIfTI tree → train → checkpoint → resume →
cross-validate → validate → predict → CLI. The whole capability surface on
tiny shapes (SURVEY.md §4's integration-test plan)."""

import pytest

# compile-heavy on a 1-core host (measured; see pyproject's marker
# registration) - excluded from the quick lane `pytest -m 'not slow'`
pytestmark = pytest.mark.slow

import json
import os

import numpy as np
import pytest

from pcmseg_tpu.core.config import get_config
from pcmseg_tpu.data.synthetic import make_synthetic_dataset

TARGET = (16, 16, 16)
N_CASES = 8


def tiny_config(root, save_dir, **kw):
    kw.setdefault("base_features", 4)
    kw.setdefault("remat", False)
    kw.setdefault("compute_dtype", "float32")
    kw.setdefault("target_size", TARGET)
    kw.setdefault("batch_size", 2)
    kw.setdefault("num_epochs", 2)
    kw.setdefault("learning_rate", 3e-3)
    kw.setdefault("val_fraction", 0.25)
    kw.setdefault("early_stopping", False)
    kw.setdefault("save_frequency", 0)
    return get_config(
        "standard", data_dir=root, save_dir=save_dir, **kw
    )


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("e2e_data"))
    make_synthetic_dataset(root, n_cases=N_CASES, shape=(20, 20, 20), seed=3)
    return root


@pytest.fixture(scope="module")
def trained(data_root, tmp_path_factory):
    """Train once for 2 epochs; reused by resume/validate/predict tests."""
    from pcmseg_tpu.train.trainer import Trainer

    save_dir = str(tmp_path_factory.mktemp("ckpt"))
    config = tiny_config(data_root, save_dir)
    trainer = Trainer(config)
    history = trainer.train()
    return config, save_dir, history


def test_training_produces_history_and_checkpoints(trained):
    config, save_dir, history = trained
    assert len(history["train_loss"]) == 2
    assert len(history["val_loss"]) == 2
    assert all(np.isfinite(history["train_loss"]))
    assert os.path.isdir(os.path.join(save_dir, "latest", "state"))
    assert os.path.isdir(os.path.join(save_dir, "best", "state"))
    meta = json.load(open(os.path.join(save_dir, "latest", "meta.json")))
    assert meta["epoch"] == 1
    assert meta["config"]["base_features"] == 4


def test_resume_continues_from_latest(trained, data_root):
    from pcmseg_tpu.train.trainer import Trainer

    config, save_dir, history = trained
    config2 = config.replace(resume=True, num_epochs=3)
    trainer = Trainer(config2)
    assert trainer.start_epoch == 2
    # history carried over; one more epoch appended
    h = trainer.train()
    assert len(h["train_loss"]) == 3
    assert h["train_loss"][:2] == history["train_loss"]


def test_validator_on_trained_checkpoint(trained, data_root):
    from pcmseg_tpu.infer.validate import Validator

    config, save_dir, _ = trained
    v = Validator(config, os.path.join(save_dir, "best"))
    results = v.validate()
    assert results["case_count"] == N_CASES
    assert 0.0 <= results["avg_dice"] <= 1.0
    assert 0.0 <= results["avg_iou"] <= results["avg_dice"] + 1e-9
    path = os.path.join(config.save_dir, "validation_results.json")
    saved = json.load(open(path))
    assert set(saved) == {
        "timestamp", "avg_dice", "avg_iou", "case_count", "case_results",
    }
    assert {r["case_id"] for r in saved["case_results"]} == {
        f"case{i:03d}" for i in range(N_CASES)
    }


def test_predictor_case_dir_and_nifti_output(trained, data_root, tmp_path):
    from pcmseg_tpu.data.io import read_volume
    from pcmseg_tpu.infer.predict import Predictor

    config, save_dir, _ = trained
    # build a predict-style case dir (one subdir per modality) from case000
    case_dir = str(tmp_path / "case000")
    for m in config.modalities:
        os.makedirs(os.path.join(case_dir, m))
        src = os.path.join(
            data_root, "BPH-PCA", "BPH", m, "case000.nii.gz"
        )
        import shutil

        shutil.copy(src, os.path.join(case_dir, m, "image.nii.gz"))

    predictor = Predictor(config, os.path.join(save_dir, "best"))
    out_path = str(tmp_path / "pred" / "seg.nii.gz")
    predictor.predict_and_save(case_dir, out_path)

    pred = read_volume(out_path)
    src_vol = read_volume(
        os.path.join(data_root, "BPH-PCA", "BPH", "ADC", "case000.nii.gz")
    )
    assert pred.shape == src_vol.shape  # native-resolution prediction
    assert set(np.unique(pred.data)) <= {0, 1}
    # spatial metadata copied from the reference image
    np.testing.assert_allclose(pred.spacing, src_vol.spacing, rtol=1e-5)
    np.testing.assert_allclose(pred.origin, src_vol.origin, rtol=1e-5)


def test_predict_mask_matches_host_thresholded_probs(trained, data_root, tmp_path):
    """Device-side thresholding (predict_mask, the 4x-smaller D2H serving
    path) must agree voxel-for-voxel with host-thresholded predict_probs."""
    from pcmseg_tpu.infer.predict import Predictor, load_multimodal_images

    config, save_dir, _ = trained
    case_dir = str(tmp_path / "case_mask")
    import shutil

    for m in config.modalities:
        os.makedirs(os.path.join(case_dir, m))
        shutil.copy(
            os.path.join(data_root, "BPH-PCA", "BPH", m, "case000.nii.gz"),
            os.path.join(case_dir, m, "img.nii.gz"),
        )
    predictor = Predictor(config, os.path.join(save_dir, "best"))
    image, _ = load_multimodal_images(case_dir, config.modalities)
    probs = predictor.predict_probs(image)
    host_mask = (
        np.asarray(probs, np.float32)[..., 0] > config.threshold
    ).astype(np.uint8)
    dev_mask = predictor.predict_mask(image)
    assert dev_mask.dtype == np.uint8 and dev_mask.shape == image.shape[:3]
    np.testing.assert_array_equal(dev_mask, host_mask)


def test_predictor_missing_modality_strategies(trained, data_root, tmp_path):
    from pcmseg_tpu.infer.predict import load_multimodal_images

    config, _, _ = trained
    case_dir = str(tmp_path / "partial_case")
    import shutil

    for m in ["ADC", "DWI"]:  # only 2 of 5 modalities present
        os.makedirs(os.path.join(case_dir, m))
        shutil.copy(
            os.path.join(data_root, "BPH-PCA", "BPH", m, "case001.nii.gz"),
            os.path.join(case_dir, m, "img.nii.gz"),
        )

    img_zero, ref = load_multimodal_images(
        case_dir, config.modalities, handle_missing="zero_fill"
    )
    assert img_zero.shape == ref.shape + (5,)
    assert np.all(img_zero[..., 2] == 0)

    img_dup, _ = load_multimodal_images(
        case_dir, config.modalities, handle_missing="duplicate"
    )
    np.testing.assert_array_equal(img_dup[..., 2], img_dup[..., 0])

    with pytest.raises(FileNotFoundError):
        load_multimodal_images(case_dir, config.modalities, handle_missing="skip")


def test_cross_validation_trainer(data_root, tmp_path):
    from pcmseg_tpu.train.cv import CrossValidationTrainer

    save_dir = str(tmp_path / "cv_ckpt")
    config = tiny_config(
        data_root, save_dir, n_splits=2, num_epochs=1, validation=True
    )
    cv = CrossValidationTrainer(config)
    results = cv.train()

    assert results["summary"]["total_folds"] == 2
    assert np.isfinite(results["summary"]["mean_val_loss"])
    saved = json.load(open(os.path.join(save_dir, "cv_results.json")))
    assert set(saved) == {"config", "fold_results", "summary"}
    assert [r["fold"] for r in saved["fold_results"]] == [1, 2]
    assert set(saved["fold_results"][0]) == {
        "fold", "best_val_loss", "epochs_trained",
    }
    for k in range(2):
        hist = json.load(open(os.path.join(save_dir, f"fold_{k}_history.json")))
        # Schema policy (PARITY.md row 10): SUPERSET of the reference's
        # fold history (train_bph_cv.py:254-260 writes train/val loss);
        # we additionally record val_dice/val_iou when validation is on.
        assert {"train_loss", "val_loss"} <= set(hist)
        assert all(len(v) == len(hist["train_loss"]) for v in hist.values())
        assert os.path.isdir(os.path.join(save_dir, f"best_fold_{k}", "state"))


def test_cli_check_and_validate(trained, data_root, tmp_path, capsys):
    from pcmseg_tpu.cli.main import main

    config, save_dir, _ = trained
    report_path = str(tmp_path / "report.json")
    rc = main(
        ["check", "--data_dir", data_root, "--save_dir", save_dir,
         "--output", report_path]
    )
    assert rc == 0
    report = json.load(open(report_path))
    assert report["data"]["types"]["BPH"]["present"]
    assert "latest" in report["checkpoints"]["checkpoints"]

    rc = main(
        [
            "validate",
            "--data_dir", data_root,
            "--model_path", os.path.join(save_dir, "best"),
            "--target_size", "16", "16", "16",
            "--base_features", "4",
            "--batch_size", "2",
            "--save_dir", str(tmp_path),
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "avg_dice=" in out


def test_cli_error_paths(tmp_path, capsys):
    from pcmseg_tpu.cli.main import main

    # validate with a bogus model path → clean failure (rc 1), not a crash
    rc = main(
        [
            "validate",
            "--data_dir", str(tmp_path),
            "--model_path", str(tmp_path / "nope"),
        ]
    )
    assert rc == 1


def test_cli_predict_sliding_window(trained, data_root, tmp_path, capsys):
    """run.py predict --sliding_window over a case larger than the window."""
    import shutil

    from pcmseg_tpu.cli.main import main
    from pcmseg_tpu.data.io import read_volume

    config, save_dir, _ = trained
    case_dir = str(tmp_path / "case003")
    for m in config.modalities:
        os.makedirs(os.path.join(case_dir, m))
        shutil.copy(
            os.path.join(data_root, "BPH-PCA", "BPH", m, "case003.nii.gz"),
            os.path.join(case_dir, m, "img.nii.gz"),
        )
    rc = main(
        [
            "predict",
            "--model_path", os.path.join(save_dir, "best"),
            "--input_dir", case_dir,
            "--output_dir", str(tmp_path / "out"),
            "--output_name", "sw.nii.gz",
            "--base_features", "4",
            "--target_size", "16", "16", "16",
            "--sliding_window",
            "--window_size", "16", "16", "16",
            "--window_overlap", "0.5",
        ]
    )
    assert rc == 0
    pred = read_volume(str(tmp_path / "out" / "sw.nii.gz"))
    src = read_volume(
        os.path.join(data_root, "BPH-PCA", "BPH", "ADC", "case003.nii.gz")
    )
    assert pred.shape == src.shape  # 20^3 case tiled by 16^3 windows
    assert set(np.unique(pred.data)) <= {0, 1}


def test_cli_export_roundtrip(trained, data_root, tmp_path, capsys):
    """run.py export writes the reference's .pth format and the round trip
    is lossless: validating the exported .pth scores identically to
    validating the Orbax checkpoint it came from."""
    import torch

    from pcmseg_tpu.cli.main import main

    config, save_dir, _ = trained
    pth = str(tmp_path / "exported" / "model.pth")
    rc = main(
        ["export", "--model_path", os.path.join(save_dir, "best"),
         "--output", pth]
    )
    assert rc == 0 and os.path.exists(pth)

    # reference-compatible payload (script/validate_model.py:174-180):
    # model_state_dict with torch-layout kernels and BN running stats
    payload = torch.load(pth, map_location="cpu", weights_only=False)
    sd = payload["model_state_dict"]
    assert sd["inc.conv.0.weight"].shape == (4, 5, 3, 3, 3)  # OIDHW
    assert any(k.endswith("running_mean") for k in sd)
    assert "epoch" in payload  # meta.json carried over

    common = [
        "--data_dir", data_root,
        "--target_size", "16", "16", "16",
        "--base_features", "4",
        "--batch_size", "2",
        "--save_dir", str(tmp_path),
    ]
    rc = main(
        ["validate", "--model_path", os.path.join(save_dir, "best"), *common]
    )
    assert rc == 0
    orbax_line = capsys.readouterr().out.strip().splitlines()[-1]
    # .pth checkpoints default to the reference's minmax inference
    # normalization — override back to the training-time normalize so the
    # comparison isolates the weight round trip
    rc = main(
        ["validate", "--model_path", pth, "--normalize", "percentile",
         *common]
    )
    assert rc == 0
    pth_line = capsys.readouterr().out.strip().splitlines()[-1]
    assert pth_line == orbax_line


def test_cross_validation_resume_skips_completed_folds(data_root, tmp_path):
    """CV restart after a mid-run kill: completed folds (marked by their
    fold_{k}_history.json) are skipped without retraining; the interrupted
    fold re-enters via its own latest_fold_{k} checkpoint."""
    from pcmseg_tpu.train.cv import CrossValidationTrainer

    save_dir = str(tmp_path / "cv_resume")
    config = tiny_config(
        data_root, save_dir, n_splits=2, num_epochs=2, validation=True
    )
    first = CrossValidationTrainer(config)
    results = first.train()
    assert results["summary"]["total_folds"] == 2

    # simulate a kill during fold 1: its completion marker is gone, but
    # its epoch-1 checkpoint survives (fold 0 fully intact)
    hist1 = os.path.join(save_dir, "fold_1_history.json")
    full_hist1 = json.load(open(hist1))
    os.remove(hist1)
    os.remove(os.path.join(save_dir, "cv_results.json"))
    # back-date the surviving latest_fold_1 to epoch 0 (as if epoch 1 never
    # ran): rewrite meta.json's epoch/history
    meta_path = os.path.join(save_dir, "latest_fold_1", "meta.json")
    meta = json.load(open(meta_path))
    meta["epoch"] = 0
    meta["history"] = {
        "train_loss": meta["history"]["train_loss"][:1],
        "val_loss": meta["history"]["val_loss"][:1],
    }
    json.dump(meta, open(meta_path, "w"))

    import time as _t

    fold0_best_mtime = os.path.getmtime(
        os.path.join(save_dir, "best_fold_0", "meta.json")
    )
    _t.sleep(0.05)

    second = CrossValidationTrainer(config.replace(resume=True))
    results2 = second.train()

    # fold 0 was skipped: its best checkpoint untouched, result carried over
    assert os.path.getmtime(
        os.path.join(save_dir, "best_fold_0", "meta.json")
    ) == fold0_best_mtime
    assert results2["fold_results"][0] == results["fold_results"][0]
    # fold 1 resumed from epoch 1 and completed: full-length history again,
    # first epoch identical to the original run's
    hist1_new = json.load(open(hist1))
    assert len(hist1_new["train_loss"]) == 2
    assert hist1_new["train_loss"][0] == full_hist1["train_loss"][0]
    assert results2["summary"]["total_folds"] == 2
    assert os.path.exists(os.path.join(save_dir, "cv_results.json"))


def test_deep_supervision_full_lifecycle(data_root, tmp_path):
    """A --deep_supervision run flows through the whole product surface:
    its checkpoint validates (config auto-adoption rebuilds the DS model),
    predicts through the BN-folded serving path (aux heads are dead
    weight), and exports to a reference-layout .pth with the ds{i} heads
    stripped — the reference class has no DS, so the exported state_dict
    must carry exactly the non-DS keys."""
    from pcmseg_tpu.infer.validate import Validator
    from pcmseg_tpu.train.checkpoints import params_to_torch_state_dict
    from pcmseg_tpu.train.trainer import Trainer

    save_dir = str(tmp_path / "ds_ckpt")
    config = tiny_config(data_root, save_dir, deep_supervision=True)
    trainer = Trainer(config)
    history = trainer.train()
    assert np.isfinite(history["train_loss"]).all()

    # validate: loads the checkpoint's own config snapshot (DS on) and
    # must restore the params tree including the ds{i} heads
    v = Validator(config, os.path.join(save_dir, "best"))
    results = v.validate()
    assert results["case_count"] == N_CASES
    assert 0.0 <= results["avg_dice"] <= 1.0

    # predict: the folded serving model is built without DS; the extra
    # ds{i} param subtrees must be inert, not fatal
    from pcmseg_tpu.infer.predict import Predictor

    case_dir = str(tmp_path / "case000")
    for m in config.modalities:
        os.makedirs(os.path.join(case_dir, m))
        import shutil

        shutil.copy(
            os.path.join(data_root, "BPH-PCA", "BPH", m, "case000.nii.gz"),
            os.path.join(case_dir, m, "image.nii.gz"),
        )
    predictor = Predictor(config, os.path.join(save_dir, "best"))
    out_path = str(tmp_path / "pred" / "seg.nii.gz")
    predictor.predict_and_save(case_dir, out_path)
    assert os.path.exists(out_path)

    # export: ds{i} heads are dropped so the .pth stays strict-loadable
    # into the reference class (train/checkpoints.py walks named entries)
    state = trainer.state
    sd = params_to_torch_state_dict(state.params, state.batch_stats)
    assert not any("ds" in k for k in sd)
    # identical key set to a DS-off export of the same architecture
    config_plain = tiny_config(data_root, str(tmp_path / "plain"))
    from pcmseg_tpu.models import UNet3D
    from pcmseg_tpu.train.steps import create_train_state

    import jax

    plain = create_train_state(
        config_plain, jax.random.key(0), UNet3D.from_config(config_plain),
        (1, 16, 16, 16, 5),
    )
    sd_plain = params_to_torch_state_dict(plain.params, plain.batch_stats)
    assert set(sd) == set(sd_plain)


def test_validate_with_postprocess_scores_filtered_masks(trained, data_root):
    """--postprocess largest_cc reroutes scoring through host-filtered
    masks (infer/postprocess.py): the run completes, dice stays in range,
    and it can only differ from the unfiltered score by removing
    *predicted-positive* voxels — so predicted volume never grows."""
    import dataclasses

    from pcmseg_tpu.infer.validate import Validator

    config, save_dir, _ = trained
    base = Validator(config, os.path.join(save_dir, "best"))
    plain = base.validate(save=False)

    cfg_pp = dataclasses.replace(config, postprocess="largest_cc")
    v = Validator(cfg_pp, os.path.join(save_dir, "best"))
    assert v._postprocess
    results = v.validate(save=False)
    assert results["case_count"] == N_CASES
    for r in results["case_results"]:
        assert 0.0 <= r["dice"] <= 1.0
    # identical inputs, identical threshold: any dice change comes only
    # from the component filter, which is deterministic
    again = Validator(cfg_pp, os.path.join(save_dir, "best")).validate(save=False)
    assert [r["dice"] for r in again["case_results"]] == [
        r["dice"] for r in results["case_results"]
    ]
    assert isinstance(plain["avg_dice"], float)
