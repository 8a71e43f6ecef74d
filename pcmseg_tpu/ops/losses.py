"""Segmentation losses as pure jnp functions.

Exact formula parity with the reference's ``utils/losses.py``:
  * Dice loss (utils/losses.py:16-92): sigmoid → global flatten →
    ``1 - (2·∩ + smooth) / (Σp + Σt + smooth)`` with smooth=1.0.
  * BCE+Dice (utils/losses.py:95-152): ``w_bce·BCEWithLogits + w_dice·Dice``
    with default weights 0.5/0.5.

TPU notes: reductions are computed in float32 regardless of the activation
dtype (bf16 logits upcast before the big sums — the sums run over up to
2M voxels per sample, where bf16 accumulation would lose precision). Under
jit with a batch sharded over a 'data' mesh axis, the global flatten-sum
makes XLA insert the cross-replica psum automatically, so the loss is the
true global-batch loss (same semantics as the reference's single-device
global flatten).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import nn as jnn


def _flatten_f32(x: jnp.ndarray) -> jnp.ndarray:
    return x.reshape(-1).astype(jnp.float32)


def _sample_weight_f32(weight: jnp.ndarray, like: jnp.ndarray) -> jnp.ndarray:
    """(N,) per-sample weight → broadcastable (N,1,...,1) float32."""
    return weight.reshape((like.shape[0],) + (1,) * (like.ndim - 1)).astype(
        jnp.float32
    )


def dice_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    smooth: float = 1.0,
    weight: jnp.ndarray = None,
):
    """Soft Dice loss over the whole batch (global flatten, like the reference).

    Args:
      logits: raw model outputs, any shape.
      targets: binary ground truth, same shape as ``logits``.
      smooth: smoothing constant (reference default 1.0).
      weight: optional (N,) per-sample 0/1 weights. Zero-weight samples
        (mask padding for ragged tail batches) contribute nothing to the
        global sums, so the loss — and its gradient — equals the unpadded
        global-flatten Dice over the real samples.
    """
    if logits.shape != targets.shape:
        raise ValueError(
            f"shape mismatch: logits {logits.shape} vs targets {targets.shape}"
        )
    probs = jnn.sigmoid(logits).astype(jnp.float32)
    t = targets.astype(jnp.float32)
    if weight is not None:
        w = _sample_weight_f32(weight, logits)
        probs = probs * w
        t = t * w
    intersection = jnp.sum(probs * t)
    dice = (2.0 * intersection + smooth) / (jnp.sum(probs) + jnp.sum(t) + smooth)
    return 1.0 - dice


def bce_loss(logits: jnp.ndarray, targets: jnp.ndarray, weight: jnp.ndarray = None):
    """Mean binary cross-entropy with logits (numerically stable).

    Matches ``torch.nn.BCEWithLogitsLoss`` (mean reduction):
    ``max(x,0) - x·t + log(1 + exp(-|x|))``. With per-sample ``weight`` the
    mean runs over real (weight>0) voxels only.
    """
    x = logits.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    per_elem = jnp.maximum(x, 0.0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))
    if weight is None:
        return jnp.mean(per_elem)
    # samples all have the same voxel count, so the masked per-voxel mean
    # equals the weighted mean of per-sample means
    w = weight.astype(jnp.float32)
    axes = tuple(range(1, per_elem.ndim))
    per_sample = jnp.mean(per_elem, axis=axes)
    return jnp.sum(per_sample * w) / jnp.maximum(jnp.sum(w), 1.0)


def bce_dice_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    bce_weight: float = 0.5,
    dice_weight: float = 0.5,
    smooth: float = 1.0,
    weight: jnp.ndarray = None,
):
    """Weighted BCE + Dice combination (reference utils/losses.py:95-152)."""
    return bce_weight * bce_loss(logits, targets, weight) + dice_weight * dice_loss(
        logits, targets, smooth, weight
    )


def make_loss_fn(name: str, **kwargs):
    """Loss factory keyed by config names ('dice' | 'bce_dice').

    Returned fns take (logits, targets, weight=None)."""
    if name == "dice":
        smooth = kwargs.get("dice_smooth", 1.0)
        return lambda logits, targets, weight=None: dice_loss(
            logits, targets, smooth, weight
        )
    if name == "bce_dice":
        return lambda logits, targets, weight=None: bce_dice_loss(
            logits,
            targets,
            bce_weight=kwargs.get("bce_weight", 0.5),
            dice_weight=kwargs.get("dice_weight", 0.5),
            smooth=kwargs.get("dice_smooth", 1.0),
            weight=weight,
        )
    raise ValueError(f"unknown loss: {name!r}")
