"""EMA (Polyak) weight averaging: update math, eval selection,
checkpoint round-trip, and back-compat with pre-EMA checkpoints.

Beyond-reference capability (the torch reference has no weight
averaging); semantics follow tf.train.ExponentialMovingAverage
(warmup decay min(decay, (1+t)/(10+t)))."""

import pytest

# compile-heavy on a 1-core host - excluded from the quick lane
pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp
import numpy as np

from pcmseg_tpu.core.config import get_config
from pcmseg_tpu.models import UNet3D
from pcmseg_tpu.train.checkpoints import load_checkpoint, save_checkpoint
from pcmseg_tpu.train.steps import (
    create_train_state,
    jit_eval_step,
    jit_train_step,
    make_eval_step,
    make_train_step,
)

from test_train_steps import blob_batch, tiny_config


def _leaves(tree):
    return jax.tree.leaves(jax.device_get(tree))


def test_ema_update_matches_manual_recursion():
    decay = 0.5
    config = tiny_config(learning_rate=1e-2, ema_decay=decay)
    model = UNet3D.from_config(config)
    state = create_train_state(config, jax.random.key(0), model, (2, 16, 16, 16, 5))
    step = jit_train_step(make_train_step(model, config), donate=False)
    batch = blob_batch(jax.random.key(1))

    # ema starts as a copy of the init params (fresh buffers)
    for e, p in zip(_leaves(state.ema_params), _leaves(state.params)):
        np.testing.assert_array_equal(e, p)

    expected = [np.asarray(x, np.float64) for x in _leaves(state.params)]
    for _ in range(3):
        state, _ = step(state, batch)
        t = float(state.step)  # optimizer updates so far
        d = min(decay, (1.0 + t) / (10.0 + t))
        live = [np.asarray(x, np.float64) for x in _leaves(state.params)]
        expected = [d * e + (1.0 - d) * p for e, p in zip(expected, live)]

    got = _leaves(state.ema_params)
    assert len(got) == len(expected)
    for g, e in zip(got, expected):
        np.testing.assert_allclose(np.asarray(g, np.float64), e, atol=1e-5)


def test_ema_disabled_keeps_empty_tree_and_identical_training():
    """ema_decay=0 leaves ema_params empty; the params trajectory is
    identical with EMA on/off (the average never feeds back into grads)."""
    batch = blob_batch(jax.random.key(1))
    trajectories = []
    for decay in (0.0, 0.9):
        config = tiny_config(learning_rate=1e-2, ema_decay=decay)
        model = UNet3D.from_config(config)
        state = create_train_state(
            config, jax.random.key(0), model, (2, 16, 16, 16, 5)
        )
        if decay == 0.0:
            assert state.ema_params == {}
        step = jit_train_step(make_train_step(model, config), donate=False)
        for _ in range(2):
            state, _ = step(state, batch)
        trajectories.append(_leaves(state.params))
    for a, b in zip(*trajectories):
        np.testing.assert_array_equal(a, b)


def test_eval_step_scores_ema_weights():
    config = tiny_config(ema_decay=0.99)
    model = UNet3D.from_config(config)
    state = create_train_state(config, jax.random.key(0), model, (2, 16, 16, 16, 5))
    # make the averaged weights VISIBLY different from the live ones
    state = state.replace(
        params=jax.tree.map(lambda p: jnp.zeros_like(p), state.params)
    )
    batch = blob_batch(jax.random.key(2))

    ema_eval = jit_eval_step(make_eval_step(model, config))
    live_eval = jit_eval_step(
        make_eval_step(model, config.replace(ema_eval=False))
    )
    # reference: a plain no-EMA state whose LIVE params are the ema weights
    ref_state = create_train_state(
        config.replace(ema_decay=0.0),
        jax.random.key(0),
        model,
        (2, 16, 16, 16, 5),
    )
    ref_eval = jit_eval_step(
        make_eval_step(model, config.replace(ema_decay=0.0))
    )

    m_ema = jax.device_get(ema_eval(state, batch))
    m_ref = jax.device_get(ref_eval(ref_state, batch))
    m_live = jax.device_get(live_eval(state, batch))
    np.testing.assert_allclose(m_ema["loss"], m_ref["loss"], rtol=1e-6)
    assert abs(float(m_live["loss"]) - float(m_ref["loss"])) > 1e-6


def test_ema_checkpoint_roundtrip_and_serving_swap(tmp_path):
    config = tiny_config(ema_decay=0.9)
    model = UNet3D.from_config(config)
    state = create_train_state(config, jax.random.key(0), model, (2, 16, 16, 16, 5))
    step = jit_train_step(make_train_step(model, config), donate=False)
    state, _ = step(state, blob_batch(jax.random.key(1)))

    meta = {"epoch": 0, "config": config.to_dict()}
    save_checkpoint(str(tmp_path), "latest", state, meta)

    template = create_train_state(
        config, jax.random.key(7), model, (2, 16, 16, 16, 5)
    )
    restored, _ = load_checkpoint(str(tmp_path / "latest"), template)
    for a, b in zip(_leaves(restored.ema_params), _leaves(state.ema_params)):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(_leaves(restored.params), _leaves(state.params)):
        np.testing.assert_array_equal(a, b)

    # serving entry point swaps params -> ema (and --no_ema keeps live)
    from pcmseg_tpu.infer.validate import load_model_state

    _, served = load_model_state(config, str(tmp_path / "latest"))
    for a, b in zip(_leaves(served.params), _leaves(state.ema_params)):
        np.testing.assert_array_equal(a, b)
    _, live = load_model_state(
        config.replace(ema_eval=False), str(tmp_path / "latest")
    )
    for a, b in zip(_leaves(live.params), _leaves(state.params)):
        np.testing.assert_array_equal(a, b)


def test_ema_template_mismatch_fallbacks(tmp_path):
    size = (2, 16, 16, 16, 5)
    cfg_off = tiny_config(ema_decay=0.0)
    cfg_on = tiny_config(ema_decay=0.9)
    model = UNet3D.from_config(cfg_off)

    # pre-EMA checkpoint restored into an EMA-enabled template:
    # EMA restarts from the restored params
    plain = create_train_state(cfg_off, jax.random.key(0), model, size)
    save_checkpoint(str(tmp_path / "a"), "latest", plain, {})
    tmpl_on = create_train_state(cfg_on, jax.random.key(3), model, size)
    restored, _ = load_checkpoint(str(tmp_path / "a" / "latest"), tmpl_on)
    for e, p in zip(_leaves(restored.ema_params), _leaves(restored.params)):
        np.testing.assert_array_equal(e, p)
    for a, b in zip(_leaves(restored.params), _leaves(plain.params)):
        np.testing.assert_array_equal(a, b)

    # EMA checkpoint restored into a plain template: ema subtree dropped
    withema = create_train_state(cfg_on, jax.random.key(1), model, size)
    save_checkpoint(str(tmp_path / "b"), "latest", withema, {})
    tmpl_off = create_train_state(cfg_off, jax.random.key(4), model, size)
    restored2, _ = load_checkpoint(str(tmp_path / "b" / "latest"), tmpl_off)
    assert restored2.ema_params == {}
    for a, b in zip(_leaves(restored2.params), _leaves(withema.params)):
        np.testing.assert_array_equal(a, b)


def test_trainer_ema_end_to_end(tmp_path):
    """CLI-config -> Trainer with EMA: trains, checkpoints carry EMA,
    validate adopts ema_decay from the snapshot and scores the average."""
    from pcmseg_tpu.data.synthetic import make_synthetic_dataset
    from pcmseg_tpu.infer.validate import Validator
    from pcmseg_tpu.train.trainer import Trainer

    root = str(tmp_path / "data")
    make_synthetic_dataset(root, n_cases=6, shape=(20, 20, 20), seed=5)
    config = get_config(
        "quick",
        data_dir=root,
        num_epochs=2,
        batch_size=2,
        base_features=4,
        target_size=(16, 16, 16),
        compute_dtype="float32",
        remat=False,
        validation=True,
        val_fraction=0.34,
        early_stopping=False,
        save_dir=str(tmp_path / "ckpt"),
        ema_decay=0.9,
        device_data_cache_gb=0.0,
    )
    trainer = Trainer(config)
    history = trainer.train()
    assert len(history["train_loss"]) == 2
    assert all(np.isfinite(v) for v in history["train_loss"])

    # the saved checkpoint carries the EMA subtree, and a default-config
    # Validator (ema_decay=0) adopts ema_decay from the snapshot
    base = get_config(
        "quick",
        data_dir=root,
        cache_dir=config.cache_dir,
    )
    v = Validator(base, str(tmp_path / "ckpt" / "best"))
    assert v.config.ema_decay == 0.9
    results = v.validate()
    assert np.isfinite(results["avg_dice"])
