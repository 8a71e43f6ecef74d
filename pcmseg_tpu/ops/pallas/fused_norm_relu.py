"""Pallas TPU kernel: fused per-channel scale-shift-ReLU.

``y = max(x * scale + shift, 0)`` over an NDHWC tensor with per-channel
(last-axis) scale/shift — the inference form of BatchNorm+ReLU after the
statistics are frozen:

    scale = gamma / sqrt(var + eps),  shift = beta - mean * scale

Streams the tensor through VMEM in lane-aligned (rows, C) tiles; the VPU
does the multiply-add-max. Used by the BN-folded inference path
(pcmseg_tpu/infer/fold_bn.py); the training path leaves this to XLA's own
fusion (which already handles BN training well).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROWS = 512  # rows per tile; C columns (lane dim)


def _kernel(x_ref, scale_ref, shift_ref, out_ref):
    x = x_ref[:].astype(jnp.float32)
    y = x * scale_ref[:] + shift_ref[:]
    out_ref[:] = jnp.maximum(y, 0.0).astype(out_ref.dtype)


def scale_shift_relu(
    x: jnp.ndarray, scale: jnp.ndarray, shift: jnp.ndarray
) -> jnp.ndarray:
    """Fused max(x*scale+shift, 0) with per-last-axis-channel scale/shift."""
    if scale.shape != (x.shape[-1],) or shift.shape != (x.shape[-1],):
        raise ValueError(
            f"scale/shift must be ({x.shape[-1]},); got {scale.shape}, "
            f"{shift.shape}"
        )
    orig_shape = x.shape
    c = x.shape[-1]
    flat = x.reshape(-1, c)
    n = flat.shape[0]
    padded = ((n + _ROWS - 1) // _ROWS) * _ROWS
    if padded != n:
        flat = jnp.pad(flat, ((0, padded - n), (0, 0)))

    grid = (flat.shape[0] // _ROWS,)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_ROWS, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (_ROWS, c), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(flat.shape, x.dtype),
    )(flat, scale.astype(jnp.float32)[None], shift.astype(jnp.float32)[None])
    return out[:n].reshape(orig_shape)
