import numpy as np
import pytest
import jax.numpy as jnp

from pcmseg_tpu.ops.metrics import dice_score, iou_score


def test_dice_perfect_overlap():
    m = jnp.ones((4, 4, 4))
    assert float(dice_score(m, m)) == pytest.approx(1.0, abs=1e-6)
    assert float(iou_score(m, m)) == pytest.approx(1.0, abs=1e-6)


def test_no_overlap():
    a = jnp.array([1.0, 1.0, 0.0, 0.0])
    b = jnp.array([0.0, 0.0, 1.0, 1.0])
    assert float(dice_score(a, b)) == pytest.approx(0.0, abs=1e-6)
    assert float(iou_score(a, b)) == pytest.approx(0.0, abs=1e-6)


def test_hand_computed_partial_overlap():
    # pred covers 4 voxels, target 2, overlap 2
    pred = jnp.array([1, 1, 1, 1, 0, 0], dtype=jnp.float32)
    target = jnp.array([1, 1, 0, 0, 0, 0], dtype=jnp.float32)
    # reference formula: 2*2/(4+2+1e-8), 2/(4+2-2+1e-8)
    assert float(dice_score(pred, target)) == pytest.approx(4 / 6, rel=1e-6)
    assert float(iou_score(pred, target)) == pytest.approx(2 / 4, rel=1e-6)


def test_empty_masks_give_zero_not_nan():
    z = jnp.zeros((8,))
    # eps-only-in-denominator semantics (validate_model.py:57,95): 0/eps = 0
    assert float(dice_score(z, z)) == 0.0
    assert float(iou_score(z, z)) == 0.0


def test_metric_dice_vs_loss_dice_differ_on_empty():
    # metric: 0 on empty/empty; loss-dice with smooth: 1.0 on empty/empty
    from pcmseg_tpu.ops.losses import dice_loss

    z = jnp.zeros((8,))
    assert float(dice_score(z, z)) == 0.0
    assert float(dice_loss(jnp.full((8,), -50.0), z)) == pytest.approx(0.0, abs=1e-6)


def test_random_agreement_with_numpy(rng):
    p = (rng.random((16, 16, 16)) > 0.5).astype(np.float32)
    t = (rng.random((16, 16, 16)) > 0.5).astype(np.float32)
    inter = (p * t).sum()
    want_dice = 2 * inter / (p.sum() + t.sum() + 1e-8)
    want_iou = inter / (p.sum() + t.sum() - inter + 1e-8)
    assert float(dice_score(jnp.asarray(p), jnp.asarray(t))) == pytest.approx(
        want_dice, rel=1e-6
    )
    assert float(iou_score(jnp.asarray(p), jnp.asarray(t))) == pytest.approx(
        want_iou, rel=1e-6
    )
