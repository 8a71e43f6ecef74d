"""Loss unit tests: golden values vs hand computation and vs torch (CPU).

The torch comparisons pin exact formula parity with the reference's
utils/losses.py (DiceLoss smooth=1.0, BCEDiceLoss 0.5/0.5).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from pcmseg_tpu.ops.losses import (
    bce_dice_loss,
    bce_loss,
    dice_loss,
    focal_dice_loss,
    focal_loss,
    make_loss_fn,
    tversky_loss,
)

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
        make_loss_fn("jaccard_hinge")


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


# ---- beyond-reference losses: tversky / focal / focal_dice -----------------


def test_tversky_equals_dice_at_half_half(rng):
    """alpha=beta=0.5, smooth=0 reduces Tversky to Dice exactly.

    (With smooth s the identity is tversky(s) == dice(2s): the denominator
    halves, so only the s=0 case matches term for term.)
    """
    logits = jnp.asarray(rng.normal(size=(2, 6, 6, 6, 1)).astype(np.float32))
    target = jnp.asarray((rng.random((2, 6, 6, 6, 1)) > 0.7).astype(np.float32))
    got = float(tversky_loss(logits, target, alpha=0.5, beta=0.5, smooth=0.0))
    want = float(dice_loss(logits, target, smooth=0.0))
    assert got == pytest.approx(want, rel=1e-6)
    got_s = float(tversky_loss(logits, target, alpha=0.5, beta=0.5, smooth=1.0))
    want_s = float(dice_loss(logits, target, smooth=2.0))
    assert got_s == pytest.approx(want_s, rel=1e-6)


def test_tversky_hand_computed():
    logits = np.array([10.0, -10.0, 10.0, -10.0], dtype=np.float32)
    target = np.array([1.0, 0.0, 0.0, 1.0], dtype=np.float32)
    p = _sigmoid(logits)
    tp = (p * target).sum()
    fp = (p * (1 - target)).sum()
    fn = ((1 - p) * target).sum()
    a, b, s = 0.3, 0.7, 1.0
    expected = 1.0 - (tp + s) / (tp + a * fp + b * fn + s)
    got = float(tversky_loss(jnp.asarray(logits), jnp.asarray(target)))
    assert got == pytest.approx(expected, abs=1e-6)


def test_tversky_beta_penalizes_false_negatives(rng):
    """With beta >> alpha, a miss (FN) must cost more than a false alarm."""
    target = np.zeros((8,), np.float32)
    target[:2] = 1.0
    miss = np.full((8,), -5.0, np.float32)  # predicts nothing: 2 FN
    alarm = np.full((8,), -5.0, np.float32)
    alarm[2:4] = 5.0  # predicts the wrong 2 voxels: 2 FP (plus the same 2 FN)
    t = jnp.asarray(target)
    l_extra_fp = float(
        tversky_loss(jnp.asarray(alarm), t, alpha=0.1, beta=0.9)
    ) - float(tversky_loss(jnp.asarray(miss), t, alpha=0.1, beta=0.9))
    # the added FP voxels barely move the loss when alpha is small
    assert 0 < l_extra_fp < 0.2


def test_focal_matches_torchvision_formula(rng):
    """Pin against torchvision's sigmoid_focal_loss definition."""
    logits = rng.normal(size=(2, 5, 5, 5, 1)).astype(np.float32) * 2
    target = (rng.random((2, 5, 5, 5, 1)) > 0.5).astype(np.float32)
    tl, tt = torch.from_numpy(logits), torch.from_numpy(target)
    gamma, alpha = 2.0, 0.25
    p = torch.sigmoid(tl)
    ce = torch.nn.functional.binary_cross_entropy_with_logits(
        tl, tt, reduction="none"
    )
    p_t = p * tt + (1 - p) * (1 - tt)
    want = (ce * ((1 - p_t) ** gamma) * (alpha * tt + (1 - alpha) * (1 - tt))).mean()
    got = float(focal_loss(jnp.asarray(logits), jnp.asarray(target), gamma, alpha))
    assert got == pytest.approx(float(want), rel=1e-5)


def test_focal_gamma_zero_is_alpha_weighted_bce(rng):
    logits = jnp.asarray(rng.normal(size=(64,)).astype(np.float32))
    target = jnp.asarray((rng.random(64) > 0.5).astype(np.float32))
    got = float(focal_loss(logits, target, gamma=0.0, alpha=0.5))
    want = 0.5 * float(bce_loss(logits, target))
    assert got == pytest.approx(want, rel=1e-5)


def test_new_losses_mask_padding_exactly(rng):
    logits = rng.normal(size=(3, 4, 4, 4, 1)).astype(np.float32)
    target = (rng.random((3, 4, 4, 4, 1)) > 0.5).astype(np.float32)
    pl = jnp.asarray(np.concatenate([logits, logits[:1]], axis=0))
    pt = jnp.asarray(np.concatenate([target, target[:1]], axis=0))
    w = jnp.asarray([1.0, 1.0, 1.0, 0.0], jnp.float32)
    for fn in (tversky_loss, focal_loss, focal_dice_loss):
        full = float(fn(jnp.asarray(logits), jnp.asarray(target)))
        masked = float(fn(pl, pt, weight=w))
        assert masked == pytest.approx(full, rel=1e-5), fn


def test_loss_factory_new_names(rng):
    logits = jnp.asarray(rng.normal(size=(2, 4, 4, 4, 1)).astype(np.float32))
    target = jnp.asarray((rng.random((2, 4, 4, 4, 1)) > 0.5).astype(np.float32))
    fn = make_loss_fn("tversky", tversky_alpha=0.3, tversky_beta=0.7)
    assert float(fn(logits, target)) == pytest.approx(
        float(tversky_loss(logits, target, 0.3, 0.7)), rel=1e-6
    )
    fn = make_loss_fn("focal", focal_gamma=3.0, focal_alpha=0.5)
    assert float(fn(logits, target)) == pytest.approx(
        float(focal_loss(logits, target, 3.0, 0.5)), rel=1e-6
    )
    fn = make_loss_fn("focal_dice")
    assert float(fn(logits, target)) == pytest.approx(
        float(focal_dice_loss(logits, target)), rel=1e-6
    )
    with pytest.raises(ValueError):
        make_loss_fn("nope")
