"""Test-time augmentation: axis-flip ensembling for segmentation serving.

The nnU-Net-standard mirror ensemble: predict under all 2³ = 8
combinations of D/H/W flips, un-flip each probability map, and average.
Flips are the only augmentations that are exactly invertible on the voxel
grid, so the ensemble is artifact-free; it trades 8× inference compute for
a consistently better Dice on orientation-ambiguous anatomy. The loop is
unrolled at trace time (static flip sets) inside the caller's jit, so TTA
costs zero extra host round trips and composes with sliding-window tiling
(each tile is ensembled in place) and with the tile-batch mesh sharding.

Beyond-reference capability: the reference predicts single-orientation
only (script/predict.py:152-172).
"""

from __future__ import annotations

from typing import Callable

# all 2^3 combinations of flipping the spatial axes of (N, D, H, W, C)
FLIP_SETS = tuple(
    tuple(ax for ax, on in zip((1, 2, 3), (fd, fh, fw)) if on)
    for fd in (False, True)
    for fh in (False, True)
    for fw in (False, True)
)


def make_tta_apply(apply_fn: Callable) -> Callable:
    """Wrap ``apply_fn(variables, x) -> probs`` with the flip ensemble.

    ``apply_fn`` must map (N, D, H, W, C) → (N, D, H, W, K) probabilities
    (averaging is done in probability space, the mirror-ensemble norm).
    """
    import jax.numpy as jnp

    def tta(variables, x):
        acc = None
        for axes in FLIP_SETS:
            xf = jnp.flip(x, axes) if axes else x
            p = apply_fn(variables, xf)
            p = jnp.flip(p, axes) if axes else p
            acc = p if acc is None else acc + p
        return acc / float(len(FLIP_SETS))

    return tta
