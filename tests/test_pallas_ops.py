"""Pallas kernel numerics parity vs the jnp reference implementations.

On the CPU test platform the kernels run in interpreter mode
(pltpu.force_tpu_interpret_mode); on TPU they compile for real. Parity
gates both.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from pcmseg_tpu.ops.losses import dice_loss
from pcmseg_tpu.ops.pallas.dice import dice_partials, fused_dice_loss
from pcmseg_tpu.ops.pallas.fused_norm_relu import scale_shift_relu


@pytest.fixture(autouse=True)
def interpret_mode():
    if jax.default_backend() != "tpu":
        with pltpu.force_tpu_interpret_mode():
            yield
    else:
        yield


def test_dice_partials_match_jnp(rng):
    logits = jnp.asarray(rng.normal(size=(2, 16, 16, 16, 1)).astype(np.float32))
    targets = jnp.asarray(
        (rng.random((2, 16, 16, 16, 1)) > 0.7).astype(np.float32)
    )
    inter, psum, tsum = np.asarray(dice_partials(logits, targets))
    p = jax.nn.sigmoid(logits).reshape(-1)
    t = targets.reshape(-1)
    assert inter == pytest.approx(float(jnp.sum(p * t)), rel=1e-5)
    assert psum == pytest.approx(float(jnp.sum(p)), rel=1e-5)
    assert tsum == pytest.approx(float(jnp.sum(t)), rel=1e-5)


def test_fused_dice_loss_matches_reference(rng):
    logits = jnp.asarray(rng.normal(size=(1, 8, 16, 16, 1)).astype(np.float32))
    targets = jnp.asarray((rng.random((1, 8, 16, 16, 1)) > 0.8).astype(np.float32))
    fused = float(fused_dice_loss(logits, targets, 1.0))
    ref = float(dice_loss(logits, targets, 1.0))
    assert fused == pytest.approx(ref, rel=1e-5)


def test_fused_dice_loss_gradient_matches(rng):
    logits = jnp.asarray(rng.normal(size=(4, 8, 128)).astype(np.float32))
    targets = jnp.asarray((rng.random((4, 8, 128)) > 0.6).astype(np.float32))
    g_fused = jax.grad(lambda x: fused_dice_loss(x, targets, 1.0))(logits)
    g_ref = jax.grad(lambda x: dice_loss(x, targets, 1.0))(logits)
    np.testing.assert_allclose(
        np.asarray(g_fused), np.asarray(g_ref), atol=1e-7
    )


def test_fused_dice_handles_non_tile_multiple_sizes(rng):
    # 1000 elements: not a multiple of the 8192-element tile → padding path
    logits = jnp.asarray(rng.normal(size=(10, 100)).astype(np.float32))
    targets = jnp.asarray((rng.random((10, 100)) > 0.5).astype(np.float32))
    fused = float(fused_dice_loss(logits, targets, 1.0))
    ref = float(dice_loss(logits, targets, 1.0))
    assert fused == pytest.approx(ref, rel=1e-5)


def test_scale_shift_relu_matches_jnp(rng):
    x = jnp.asarray(rng.normal(size=(2, 4, 4, 4, 8)).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))
    shift = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))
    got = scale_shift_relu(x, scale, shift)
    want = jnp.maximum(x * scale + shift, 0.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_scale_shift_relu_bf16(rng):
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 8, 16)), dtype=jnp.bfloat16)
    scale = jnp.ones((16,))
    shift = jnp.zeros((16,))
    got = scale_shift_relu(x, scale, shift)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, dtype=np.float32),
        np.maximum(np.asarray(x, dtype=np.float32), 0),
        atol=1e-2,
    )


def test_scale_shift_relu_shape_validation():
    with pytest.raises(ValueError):
        scale_shift_relu(jnp.zeros((2, 4, 8)), jnp.ones((4,)), jnp.zeros((8,)))
