"""Fold-ensemble serving (infer/predict.py): path expansion, vmapped
probability averaging vs per-member predictions, TTA composition."""

import os

import pytest

# compile-heavy on a 1-core host (full-model jits) - excluded from the
# quick lane `pytest -m 'not slow'`
pytestmark = pytest.mark.slow

import jax
import numpy as np

from pcmseg_tpu.core.config import get_config
from pcmseg_tpu.infer.predict import Predictor, expand_model_paths

SIZE = (16, 16, 16)


def _config(**kw):
    kw.setdefault("base_features", 4)
    kw.setdefault("remat", False)
    kw.setdefault("compute_dtype", "float32")
    kw.setdefault("target_size", SIZE)
    return get_config("standard", **kw)


def _save_checkpoints(tmp_path, config, n=2):
    """n randomly-initialized (distinct-seed) checkpoints of one arch."""
    from pcmseg_tpu.models import UNet3D
    from pcmseg_tpu.train.checkpoints import save_checkpoint
    from pcmseg_tpu.train.steps import create_train_state

    model = UNet3D.from_config(config)
    d, h, w = config.target_size
    paths = []
    for i in range(n):
        st = create_train_state(
            config, jax.random.key(i), model, (1, d, h, w, config.n_modalities)
        )
        save_checkpoint(
            str(tmp_path), f"best_fold_{i}", st, {"config": config.to_dict()}
        )
        paths.append(os.path.join(str(tmp_path), f"best_fold_{i}"))
    return paths


def test_expand_model_paths(tmp_path):
    a = tmp_path / "best_fold_1"
    b = tmp_path / "best_fold_2"
    a.mkdir()
    b.mkdir()
    # plain path: untouched (no filesystem requirement)
    assert expand_model_paths("/nope/ckpt") == ["/nope/ckpt"]
    # comma list preserves order
    assert expand_model_paths(f"{b},{a}") == [str(b), str(a)]
    # glob expands sorted; matches directories (Orbax checkpoints are dirs)
    assert expand_model_paths(str(tmp_path / "best_fold_*")) == [
        str(a), str(b)
    ]
    # list input, mixed with a glob
    assert expand_model_paths([str(a), str(tmp_path / "best_fold_2*")]) == [
        str(a), str(b)
    ]
    with pytest.raises(FileNotFoundError):
        expand_model_paths(str(tmp_path / "no_such_*"))


def test_ensemble_probs_are_mean_of_members(tmp_path):
    """K-checkpoint Predictor == arithmetic mean of the K single-model
    sigmoid probabilities (through the folded-BN serving graph)."""
    config = _config()
    paths = _save_checkpoints(tmp_path, config, n=2)
    rng = np.random.default_rng(0)
    img = rng.random((*SIZE, 5)).astype(np.float32)

    p0 = Predictor(config, paths[0]).predict_probs(img)
    p1 = Predictor(config, paths[1]).predict_probs(img)
    pe = Predictor(config, ",".join(paths)).predict_probs(img)

    # members genuinely differ (distinct init seeds) ...
    assert np.abs(p0 - p1).max() > 1e-3
    # ... and the ensemble is their exact average
    np.testing.assert_allclose(pe, (p0 + p1) / 2.0, rtol=1e-5, atol=1e-5)


def test_ensemble_validator_scores_fold_mean(tmp_path):
    """Validator with a multi-checkpoint spec scores the fold-averaged
    probabilities — cross-checked against the two single-model Predictors
    averaged by hand with the same per-case Dice formula."""
    from pcmseg_tpu.data.synthetic import make_synthetic_dataset
    from pcmseg_tpu.infer.validate import Validator
    from pcmseg_tpu.ops.metrics import EPS

    root = str(tmp_path / "data")
    make_synthetic_dataset(root, n_cases=3, shape=(16, 16, 16), seed=7)
    config = _config(
        data_dir=root, save_dir=str(tmp_path / "out"), batch_size=2
    )
    paths = _save_checkpoints(tmp_path, config, n=2)

    v = Validator(config, ",".join(paths))
    res = v.validate(save=False)
    assert res["case_count"] == 3
    got = {r["case_id"]: r["dice"] for r in res["case_results"]}

    members = [Predictor(config, p) for p in paths]
    for i in range(len(v.dataset)):
        s = v.dataset[i]
        img = np.asarray(s["image"], np.float32)
        probs = sum(m.predict_probs(img) for m in members) / len(members)
        p = (probs[..., 0] > config.threshold).astype(np.float32).reshape(-1)
        t = np.asarray(s["label"], np.float32).reshape(-1)
        inter = float((p * t).sum())
        dice = 2.0 * inter / (p.sum() + t.sum() + EPS)
        np.testing.assert_allclose(got[s["case_id"]], dice, atol=1e-5)


def test_ensemble_glob_spec_and_tta_compose(tmp_path):
    """Glob checkpoint spec + TTA: the flip ensemble wraps the fold-mean
    apply; output stays a valid probability field."""
    config = _config(tta=True)
    _save_checkpoints(tmp_path, config, n=2)
    rng = np.random.default_rng(1)
    img = rng.random((*SIZE, 5)).astype(np.float32)

    pred = Predictor(config, str(tmp_path / "best_fold_*"))
    assert pred._n_ensemble == 2
    probs = pred.predict_probs(img)
    assert probs.shape == (*SIZE, 1)
    assert float(probs.min()) >= 0.0 and float(probs.max()) <= 1.0
