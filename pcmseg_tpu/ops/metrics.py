"""Evaluation metrics with exact parity to the reference validator.

Reference formulas (script/validate_model.py:24-95), over flattened binary
masks:
  * Dice  = 2·∩ / (Σp + Σt + 1e-8)
  * IoU   = ∩ / (Σp + Σt − ∩ + 1e-8)

Note the asymmetry vs the *loss*: the metric has eps only in the denominator
(no +eps in the numerator), matching the reference exactly.
"""

from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-8


def dice_score(pred: jnp.ndarray, target: jnp.ndarray, eps: float = EPS):
    """Dice coefficient of two binary masks (any shape, flattened)."""
    p = pred.reshape(-1).astype(jnp.float32)
    t = target.reshape(-1).astype(jnp.float32)
    intersection = jnp.sum(p * t)
    return (2.0 * intersection) / (jnp.sum(p) + jnp.sum(t) + eps)


def iou_score(pred: jnp.ndarray, target: jnp.ndarray, eps: float = EPS):
    """Intersection-over-union (Jaccard) of two binary masks."""
    p = pred.reshape(-1).astype(jnp.float32)
    t = target.reshape(-1).astype(jnp.float32)
    intersection = jnp.sum(p * t)
    union = jnp.sum(p) + jnp.sum(t) - intersection
    return intersection / (union + eps)
