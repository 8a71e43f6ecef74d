"""Flip-ensemble TTA (infer/tta.py): exact ensemble math, invariance,
Predictor/CLI wiring."""

import pytest

# compile-heavy on a 1-core host (measured; see pyproject's marker
# registration) - excluded from the quick lane `pytest -m 'not slow'`
pytestmark = pytest.mark.slow

import numpy as np
import pytest

from pcmseg_tpu.infer.tta import FLIP_SETS, make_tta_apply


def test_flip_sets_enumerate_all_eight():
    assert len(FLIP_SETS) == 8
    assert () in FLIP_SETS and (1, 2, 3) in FLIP_SETS
    assert len(set(FLIP_SETS)) == 8


def test_tta_matches_numpy_reference():
    """Ensemble of an orientation-SENSITIVE model == the explicit
    flip/unflip average computed in numpy."""
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    x = rng.random((2, 4, 5, 6, 3)).astype(np.float32)
    ramp = np.arange(4, dtype=np.float32).reshape(1, 4, 1, 1, 1)

    def apply_fn(variables, t):  # depends on absolute D position
        return t[..., :1] * jnp.asarray(ramp)

    got = np.asarray(make_tta_apply(apply_fn)({}, jnp.asarray(x)))

    acc = np.zeros_like(x[..., :1])
    for axes in FLIP_SETS:
        xf = np.flip(x, axes) if axes else x
        p = xf[..., :1] * ramp
        acc += np.flip(p, axes) if axes else p
    np.testing.assert_allclose(got, acc / 8.0, rtol=1e-6)


def test_tta_is_identity_for_equivariant_model():
    """A flip-equivariant model (identity) passes through unchanged."""
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    x = rng.random((1, 6, 6, 6, 2)).astype(np.float32)
    tta = make_tta_apply(lambda v, t: t[..., :1])
    np.testing.assert_allclose(
        np.asarray(tta({}, jnp.asarray(x))), x[..., :1], rtol=1e-6
    )


def test_tta_output_is_flip_invariant():
    """TTA of any model is exactly invariant to flipping the input."""
    import jax
    import jax.numpy as jnp

    from pcmseg_tpu.models import UNet3D

    model = UNet3D(n_modalities=2, n_classes=1, base_features=4,
                   norm_layer="group", dtype=jnp.float32,
                   param_dtype=jnp.float32, remat=False)
    rng = np.random.default_rng(2)
    # 16³: the model's minimum legal input (4 levels of 2x pooling —
    # the round-4 guard at models/unet3d.py rejects anything smaller)
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 16, 2)), jnp.float32)
    v = model.init(jax.random.key(0), x, train=False)
    tta = jax.jit(make_tta_apply(
        lambda vars_, t: model.apply(vars_, t, method=UNet3D.predict)
    ))
    base = np.asarray(tta(v, x))
    flipped = np.asarray(tta(v, jnp.flip(x, (1,))))
    np.testing.assert_allclose(np.flip(flipped, (1,)), base, atol=1e-5)


def test_predictor_tta_config(tmp_path):
    """Predictor with tta=True runs end-to-end and stays in [0, 1]."""
    from test_e2e import tiny_config

    from pcmseg_tpu.data.synthetic import make_synthetic_dataset
    from pcmseg_tpu.infer.predict import Predictor
    from pcmseg_tpu.train.trainer import Trainer

    root = str(tmp_path / "data")
    make_synthetic_dataset(root, n_cases=4, shape=(18, 18, 18), seed=5)
    save_dir = str(tmp_path / "ckpt")
    config = tiny_config(root, save_dir, num_epochs=1, validation=False)
    Trainer(config).train()

    rng = np.random.default_rng(3)
    img = rng.random((16, 16, 16, 5)).astype(np.float32)
    import os

    plain = Predictor(config, os.path.join(save_dir, "best"))
    ttap = Predictor(
        config.replace(tta=True), os.path.join(save_dir, "best")
    )
    p0 = plain.predict_probs(img)
    p1 = ttap.predict_probs(img)
    assert p1.shape == p0.shape
    assert np.all(p1 >= 0) and np.all(p1 <= 1)
    # the ensemble genuinely differs from the single orientation
    assert not np.allclose(p0, p1)


def test_cli_tta_flag_parses():
    from pcmseg_tpu.cli.main import build_parser

    args = build_parser().parse_args(
        ["predict", "--model_path", "m", "--input_dir", "d", "--tta"]
    )
    assert args.tta is True
    args = build_parser().parse_args(
        ["serve", "--model_path", "m", "--input_root", "r", "--tta"]
    )
    assert args.tta is True


def test_native_resolution_validation(tmp_path):
    """validate_native scores at each label's raw grid (beyond-reference),
    reusing the already-loaded state; CLI --native reaches it."""
    import json
    import os

    from test_e2e import tiny_config

    from pcmseg_tpu.data.synthetic import make_synthetic_dataset
    from pcmseg_tpu.infer.validate import Validator
    from pcmseg_tpu.train.trainer import Trainer

    root = str(tmp_path / "data")
    # native 20^3 vs target 16^3: native eval must run at 20^3
    make_synthetic_dataset(root, n_cases=4, shape=(20, 20, 20), seed=13)
    save_dir = str(tmp_path / "ckpt")
    config = tiny_config(root, save_dir, num_epochs=1, validation=False)
    Trainer(config).train()

    v = Validator(config, os.path.join(save_dir, "best"))
    results = v.validate_native()
    assert results["resolution"] == "native"
    assert results["case_count"] == 4
    for r in results["case_results"]:
        assert r["shape"] == [20, 20, 20]
        assert 0.0 <= r["dice"] <= 1.0
    out = os.path.join(save_dir, "validation_results_native.json")
    assert json.load(open(out))["avg_dice"] == results["avg_dice"]


def test_spatially_sharded_whole_volume_predict(tmp_path):
    """spatial_parallel>1 serves the whole volume D-sharded over
    Mesh('spatial') (GSPMD conv halo exchange) with results matching the
    unsharded predictor."""
    import os

    from test_e2e import tiny_config

    from pcmseg_tpu.data.synthetic import make_synthetic_dataset
    from pcmseg_tpu.infer.predict import Predictor
    from pcmseg_tpu.train.trainer import Trainer

    root = str(tmp_path / "data")
    make_synthetic_dataset(root, n_cases=4, shape=(18, 18, 18), seed=17)
    save_dir = str(tmp_path / "ckpt")
    config = tiny_config(root, save_dir, num_epochs=1, validation=False)
    Trainer(config).train()

    rng = np.random.default_rng(5)
    img = rng.random((16, 16, 16, 5)).astype(np.float32)
    ckpt = os.path.join(save_dir, "best")
    p_plain = Predictor(config, ckpt)
    p_sp = Predictor(config.replace(spatial_parallel=4), ckpt)
    out_plain = p_plain.predict_probs(img)
    out_sp = p_sp.predict_probs(img)
    np.testing.assert_allclose(out_sp, out_plain, atol=1e-5)

    # more shards than devices → warn + serve unsharded, never crash
    p_over = Predictor(config.replace(spatial_parallel=64), ckpt)
    np.testing.assert_allclose(
        p_over.predict_probs(img), out_plain, atol=1e-5
    )


def test_spatial_sharding_raises_whole_volume_capacity(tmp_path):
    """With D sharded over n chips, volumes n× longer in D stay on the
    seam-free whole-volume path instead of overlap tiling."""
    import os

    from test_e2e import tiny_config

    from pcmseg_tpu.data.synthetic import make_synthetic_dataset
    from pcmseg_tpu.infer.predict import Predictor
    from pcmseg_tpu.train.trainer import Trainer

    root = str(tmp_path / "data")
    make_synthetic_dataset(root, n_cases=4, shape=(18, 18, 18), seed=19)
    save_dir = str(tmp_path / "ckpt")
    config = tiny_config(root, save_dir, num_epochs=1, validation=False)
    Trainer(config).train()
    ckpt = os.path.join(save_dir, "best")

    rng = np.random.default_rng(6)
    # D=32 exceeds the 16^3 window: unsharded must tile, 4-way sharded
    # must NOT (cap = 4x16 = 64)
    img = rng.random((32, 16, 16, 5)).astype(np.float32)
    cfg = config.replace(window_size=(16, 16, 16))
    p_plain = Predictor(cfg, ckpt)
    p_sp = Predictor(cfg.replace(spatial_parallel=4), ckpt)
    out_plain = p_plain.predict_probs(img)
    assert p_plain._sw_fns  # tiled
    out_sp = p_sp.predict_probs(img)
    assert not p_sp._sw_fns  # whole-volume, seam-free
    assert out_sp.shape == out_plain.shape == (32, 16, 16, 1)
