"""Numerics gates for the Pallas conv weight-gradient kernel and the
hybrid custom-VJP conv (interpret mode on CPU; compiled path on TPU).

Reference: the conv backward pair XLA derives from
``jax.grad`` of ``lax.conv_general_dilated`` — the hybrid op must be a
drop-in (same forward bytes, same gradients up to accumulation order).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcmseg_tpu.ops.pallas import conv3d_grad
from pcmseg_tpu.ops.hybrid_conv import conv3x3_hybrid, _lax_conv

INTERPRET = jax.default_backend() == "cpu"


def _rand(shape, dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=shape), dtype)


@pytest.mark.parametrize(
    "shape_ci_co",
    [((1, 4, 8, 8), 8, 16), ((2, 6, 16, 16), 16, 8)],
)
def test_dw_matches_ad(shape_ci_co):
    (n, d, h, w), ci, co = shape_ci_co
    x = _rand((n, d, h, w, ci), seed=1)
    dy = _rand((n, d, h, w, co), seed=2)
    ours = conv3d_grad.conv3x3_dw(x, dy, interpret=INTERPRET)
    ref = conv3d_grad.conv3x3_dw_reference(x, dy)
    np.testing.assert_allclose(
        np.asarray(ours), np.asarray(ref), rtol=1e-4, atol=1e-3
    )


def test_dw_chunked_matches_ad(monkeypatch):
    # force the H-chunked path: slab budget only fits 12-row chunks
    monkeypatch.setattr(conv3d_grad, "_SLAB_BYTES_LIMIT", 14 * 10 * 8 * 4)
    x = _rand((1, 4, 24, 8, 8), seed=3)
    dy = _rand((1, 4, 24, 8, 4), seed=4)
    ours = conv3d_grad.conv3x3_dw(x, dy, interpret=INTERPRET)
    ref = conv3d_grad.conv3x3_dw_reference(x, dy)
    np.testing.assert_allclose(
        np.asarray(ours), np.asarray(ref), rtol=1e-4, atol=1e-3
    )


def test_hybrid_forward_identical():
    x = _rand((1, 8, 8, 8, 8), seed=5)
    w = _rand((3, 3, 3, 8, 16), seed=6) * 0.1
    np.testing.assert_array_equal(
        np.asarray(conv3x3_hybrid(x, w)), np.asarray(_lax_conv(x, w))
    )


@pytest.mark.parametrize("dw_impl", ["decomp_ad", "xla"])
def test_hybrid_grads_match_ad(dw_impl):
    _check_hybrid_grads(dw_impl)


@pytest.mark.skipif(
    jax.default_backend() == "cpu", reason="pallas backward compiles on TPU"
)
def test_hybrid_grads_match_ad_tpu():
    _check_hybrid_grads("pallas")


def test_hybrid_grads_match_ad_interpret(monkeypatch):
    if jax.default_backend() != "cpu":
        pytest.skip("interpret-mode variant is the CPU gate")
    orig = conv3d_grad.conv3x3_dw

    def interp_dw(x, dy, interpret=False):
        return orig(x, dy, interpret=True)

    monkeypatch.setattr(conv3d_grad, "conv3x3_dw", interp_dw)
    _check_hybrid_grads("pallas")


def _check_hybrid_grads(dw_impl):
    x = _rand((1, 8, 8, 8, 8), seed=7)
    w = _rand((3, 3, 3, 8, 16), seed=8) * 0.1
    dy = _rand((1, 8, 8, 8, 16), seed=9)

    def loss(f):
        def inner(x, w):
            return jnp.sum(f(x, w).astype(jnp.float32) * dy)

        return inner

    hybrid = lambda x, w: conv3x3_hybrid(x, w, dw_impl)
    dx_h, dw_h = jax.grad(loss(hybrid), argnums=(0, 1))(x, w)
    dx_r, dw_r = jax.grad(loss(_lax_conv), argnums=(0, 1))(x, w)
    np.testing.assert_allclose(
        np.asarray(dx_h), np.asarray(dx_r), rtol=1e-4, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(dw_h), np.asarray(dw_r), rtol=1e-4, atol=1e-3
    )


def test_model_train_step_hybrid_matches_lax():
    """One full train step: 'hybrid' lowering must reproduce 'lax' —
    identical forward/loss, matching gradients (it only swaps the dW
    lowering)."""
    from pcmseg_tpu.core.config import get_config
    from pcmseg_tpu.models import UNet3D
    from pcmseg_tpu.train.steps import create_train_state, make_train_step

    losses, gnorms = {}, {}
    for lowering in ("lax", "hybrid"):
        cfg = get_config(
            "quick",
            base_features=4,
            target_size=(16, 16, 16),
            batch_size=1,
            compute_dtype="float32",
            conv_lowering=lowering,
            remat=False,
        )
        model = UNet3D.from_config(cfg)
        state = create_train_state(
            cfg, jax.random.key(0), model, (1, 16, 16, 16, 5)
        )
        rng = np.random.default_rng(0)
        batch = {
            "image": jnp.asarray(
                rng.normal(size=(1, 16, 16, 16, 5)), jnp.float32
            ),
            "label": jnp.asarray(
                rng.random((1, 16, 16, 16, 1)) > 0.8, jnp.float32
            ),
        }
        step = jax.jit(make_train_step(model, cfg))
        _, metrics = step(state, batch)
        losses[lowering] = float(metrics["loss"])
        gnorms[lowering] = float(metrics["grad_norm"])
    assert losses["hybrid"] == pytest.approx(losses["lax"], abs=1e-6)
    assert gnorms["hybrid"] == pytest.approx(gnorms["lax"], rel=1e-3)
