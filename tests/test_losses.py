"""Loss unit tests: golden values vs hand computation and vs torch (CPU).

The torch comparisons pin exact formula parity with the reference's
utils/losses.py (DiceLoss smooth=1.0, BCEDiceLoss 0.5/0.5).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from pcmseg_tpu.ops.losses import bce_dice_loss, bce_loss, dice_loss, make_loss_fn

torch = pytest.importorskip("torch")


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def test_dice_loss_hand_computed():
    logits = np.array([10.0, -10.0, 10.0, -10.0], dtype=np.float32)
    target = np.array([1.0, 0.0, 0.0, 0.0], dtype=np.float32)
    p = _sigmoid(logits)
    expected = 1.0 - (2 * (p * target).sum() + 1.0) / (p.sum() + target.sum() + 1.0)
    got = float(dice_loss(jnp.asarray(logits), jnp.asarray(target)))
    assert got == pytest.approx(expected, abs=1e-6)


def test_dice_loss_perfect_and_empty():
    # perfect prediction on an all-empty mask: smooth keeps loss at 0
    logits = np.full((2, 4, 4, 4, 1), -50.0, dtype=np.float32)
    target = np.zeros_like(logits)
    assert float(dice_loss(jnp.asarray(logits), jnp.asarray(target))) == pytest.approx(
        0.0, abs=1e-6
    )


def test_dice_loss_shape_mismatch_raises():
    with pytest.raises(ValueError):
        dice_loss(jnp.zeros((2, 3)), jnp.zeros((3, 2)))


def test_dice_loss_matches_torch_reference_formula(rng):
    logits = rng.normal(size=(2, 8, 8, 8, 1)).astype(np.float32)
    target = (rng.random((2, 8, 8, 8, 1)) > 0.7).astype(np.float32)

    tl = torch.from_numpy(logits)
    tt = torch.from_numpy(target)
    p = torch.sigmoid(tl).view(-1)
    t = tt.view(-1)
    inter = (p * t).sum()
    want = 1 - (2.0 * inter + 1.0) / (p.sum() + t.sum() + 1.0)

    got = float(dice_loss(jnp.asarray(logits), jnp.asarray(target)))
    assert got == pytest.approx(float(want), rel=1e-5)


def test_bce_loss_matches_torch(rng):
    logits = rng.normal(size=(4, 6, 6, 6)).astype(np.float32) * 3
    target = (rng.random((4, 6, 6, 6)) > 0.5).astype(np.float32)
    want = torch.nn.functional.binary_cross_entropy_with_logits(
        torch.from_numpy(logits), torch.from_numpy(target)
    )
    got = float(bce_loss(jnp.asarray(logits), jnp.asarray(target)))
    assert got == pytest.approx(float(want), rel=1e-5)


def test_bce_dice_combination(rng):
    logits = rng.normal(size=(64,)).astype(np.float32)
    target = (rng.random(64) > 0.5).astype(np.float32)
    l_bce = float(bce_loss(jnp.asarray(logits), jnp.asarray(target)))
    l_dice = float(dice_loss(jnp.asarray(logits), jnp.asarray(target)))
    got = float(bce_dice_loss(jnp.asarray(logits), jnp.asarray(target)))
    assert got == pytest.approx(0.5 * l_bce + 0.5 * l_dice, rel=1e-6)


def test_loss_factory():
    f = make_loss_fn("dice", dice_smooth=1.0)
    g = make_loss_fn("bce_dice")
    x = jnp.ones((8,))
    t = jnp.ones((8,))
    assert float(f(x, t)) >= 0.0 and float(g(x, t)) >= 0.0
    with pytest.raises(ValueError):
        make_loss_fn("focal")


def test_bf16_logits_are_upcast(rng):
    logits = rng.normal(size=(4, 16, 16, 16, 1)).astype(np.float32)
    target = (rng.random((4, 16, 16, 16, 1)) > 0.6).astype(np.float32)
    full = float(dice_loss(jnp.asarray(logits), jnp.asarray(target)))
    half = float(
        dice_loss(jnp.asarray(logits, dtype=jnp.bfloat16), jnp.asarray(target))
    )
    assert half == pytest.approx(full, abs=5e-3)


def test_weight_masks_padding_exactly(rng):
    """Padded (weight-0) samples must not change dice/bce/bce_dice at all."""
    logits = rng.normal(size=(3, 4, 4, 4, 1)).astype(np.float32)
    target = (rng.random((3, 4, 4, 4, 1)) > 0.5).astype(np.float32)
    # pad by cycling a real sample, weight 0 — exactly what the loader does
    pl = jnp.asarray(np.concatenate([logits, logits[:1]], axis=0))
    pt = jnp.asarray(np.concatenate([target, target[:1]], axis=0))
    w = jnp.asarray([1.0, 1.0, 1.0, 0.0], jnp.float32)
    for fn in (
        dice_loss,
        bce_loss,
        lambda a, b, weight=None: bce_dice_loss(a, b, weight=weight),
    ):
        full = float(fn(jnp.asarray(logits), jnp.asarray(target)))
        masked = float(fn(pl, pt, weight=w))
        assert masked == pytest.approx(full, rel=1e-6), fn


def test_all_ones_weight_is_identity(rng):
    logits = jnp.asarray(rng.normal(size=(2, 8, 8, 8, 1)).astype(np.float32))
    target = jnp.asarray((rng.random((2, 8, 8, 8, 1)) > 0.5).astype(np.float32))
    w = jnp.ones((2,), jnp.float32)
    assert float(dice_loss(logits, target, weight=w)) == pytest.approx(
        float(dice_loss(logits, target)), rel=1e-6
    )
    assert float(bce_loss(logits, target, weight=w)) == pytest.approx(
        float(bce_loss(logits, target)), rel=1e-6
    )
