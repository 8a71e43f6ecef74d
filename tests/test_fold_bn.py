"""BN folding: folded no-norm graph must match the BN eval graph."""

import pytest

# compile-heavy on a 1-core host (measured; see pyproject's marker
# registration) - excluded from the quick lane `pytest -m 'not slow'`
pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp
import numpy as np

from pcmseg_tpu.infer.fold_bn import fold_batchnorm
from pcmseg_tpu.models import UNet3D


def test_folded_matches_batchnorm_eval(rng):
    f = 4
    model = UNet3D(base_features=f, remat=False, dtype=jnp.float32)
    v = model.init_variables(jax.random.key(0))

    # make the BN stats non-trivial (fresh init has mean 0 var 1)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 16, 5)).astype(np.float32))
    _, mut = model.apply(v, x, train=True, mutable=["batch_stats"])
    variables = {"params": v["params"], "batch_stats": mut["batch_stats"]}

    want = model.apply(variables, x, train=False)

    folded_params = fold_batchnorm(variables["params"], variables["batch_stats"])
    folded_model = UNet3D(
        base_features=f, remat=False, dtype=jnp.float32, norm_layer="none"
    )
    got = folded_model.apply({"params": folded_params}, x, train=False)

    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=5e-4, rtol=1e-3
    )


def test_folded_tree_has_no_norm_entries():
    model = UNet3D(base_features=4, remat=False, dtype=jnp.float32)
    v = model.init_variables(jax.random.key(0))
    folded = fold_batchnorm(v["params"], v["batch_stats"])
    flat = jax.tree_util.tree_flatten_with_path(folded)[0]
    keys = ["/".join(str(k) for k in path) for path, _ in flat]
    assert not any("norm" in k for k in keys)
    assert any("conv0" in k for k in keys)


def test_predictor_folded_matches_unfolded(tmp_path, rng):
    """End-to-end: Predictor with fold_bn on/off gives near-identical probs."""
    import jax
    from pcmseg_tpu.core.config import get_config
    from pcmseg_tpu.train.checkpoints import save_checkpoint
    from pcmseg_tpu.train.steps import create_train_state
    from pcmseg_tpu.infer.predict import Predictor

    config = get_config(
        "quick", base_features=4, remat=False, compute_dtype="float32",
        target_size=(16, 16, 16), save_dir=str(tmp_path),
    )
    model = UNet3D.from_config(config)
    state = create_train_state(config, jax.random.key(0), model, (1, 16, 16, 16, 5))
    # nudge BN stats off their init values
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 16, 5)).astype(np.float32))
    _, mut = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        x, train=True, mutable=["batch_stats"],
    )
    state = state.replace(batch_stats=mut["batch_stats"])
    path = save_checkpoint(str(tmp_path), "best", state, {})

    img = rng.normal(size=(16, 16, 16, 5)).astype(np.float32)
    p_folded = Predictor(config, path).predict_probs(img)
    p_plain = Predictor(config.replace(fold_bn=False), path).predict_probs(img)
    np.testing.assert_allclose(p_folded, p_plain, atol=2e-4)
