"""3×3×3 SAME conv lowered as one im2col matmul, with a memory-safe VJP.

Why: XLA's native conv backward on v5e runs at 8-20% MFU at this model's
mid/deep shapes (measured, tools/bench_conv_impls.py + BENCH.md), because
the kernel-gradient conv is laid out poorly for the MXU. With spatial
extents ≤64 the im2col patch matrix is affordable to materialize, and then
forward, dL/dW, and dL/dx are all plain, well-tiled matmuls:

    y      = P(x) @ K                      P: (V, 27·Ci)   K: (27·Ci, Co)
    dL/dW  = P(x)ᵀ @ dy                    (27·Ci, Co)
    dL/dx  = fold(dy @ Kᵀ)                 col2im: 27 shifted adds

Measured fwd+bwd vs lax.conv_general_dilated (batch 1, bf16, v5e):
3.2× at 64³×128ch, 2-3× at 32³, 1.2-1.5× at 16³ (BENCH.md round-2 table).

The custom VJP recomputes the patch matrix in the backward instead of
letting AD save it — standard AD would keep ~10 GB of col buffers alive
across the U-Net at 128³ batch 1. With recompute, live memory matches the
native conv path (x and dy only); the col buffers are transient.

This is a *lowering* of the same math — bitwise-equal outputs to
lax conv in bf16 (test-gated), so checkpoints and parity are unaffected.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _im2col(x: jnp.ndarray) -> jnp.ndarray:
    """(N,D,H,W,C) → (N,D,H,W,27C) patch matrix for a SAME 3³ window."""
    n, d, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    slabs = [
        xp[:, a : a + d, b : b + h, c_ : c_ + w, :]
        for a in range(3)
        for b in range(3)
        for c_ in range(3)
    ]
    return jnp.concatenate(slabs, axis=-1)


def _fold(cols: jnp.ndarray, out_shape) -> jnp.ndarray:
    """col2im: scatter-add the 27 shifted slabs back. Adjoint of _im2col."""
    n, d, h, w, c = out_shape
    xp = jnp.zeros((n, d + 2, h + 2, w + 2, c), cols.dtype)
    for i, (a, b, c_) in enumerate(
        (a, b, c_) for a in range(3) for b in range(3) for c_ in range(3)
    ):
        xp = xp.at[:, a : a + d, b : b + h, c_ : c_ + w, :].add(
            cols[..., i * c : (i + 1) * c]
        )
    return xp[:, 1:-1, 1:-1, 1:-1, :]


@partial(jax.custom_vjp, nondiff_argnums=())
def conv3x3_im2col(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """SAME pad-1 3³ conv: (N,D,H,W,Ci) × (3,3,3,Ci,Co) → (N,D,H,W,Co)."""
    ci, co = w.shape[3], w.shape[4]
    return jnp.dot(_im2col(x), w.reshape(27 * ci, co))


def _fwd(x, w):
    return conv3x3_im2col(x, w), (x, w)


def _bwd(res, dy):
    x, w = res
    ci, co = w.shape[3], w.shape[4]
    k = w.reshape(27 * ci, co)
    patches = _im2col(x)  # recomputed, not saved — keeps live memory flat
    v = patches.reshape(-1, 27 * ci)
    dyf = dy.reshape(-1, co)
    dw = jnp.dot(v.T, dyf).reshape(w.shape)
    dcols = jnp.dot(dy, k.T)  # (N,D,H,W,27·Ci)
    dx = _fold(dcols, x.shape)
    return dx, dw


conv3x3_im2col.defvjp(_fwd, _bwd)


def should_use_im2col(spatial: tuple, cin: int, cout: int) -> bool:
    """Measured decision rule for the training path (BENCH.md).

    End-to-end train-step A/B at 128³ (not isolated microbenchmarks —
    those mislead here: XLA schedules the full graph differently):
      * im2col at the bottleneck level (spatial ≤8, wide channels) is a
        stable ~1% step win (isolated: 1.5-2.8× on those convs);
      * im2col at thin-input convs (cin ≤ 8 — the 5-modality inc conv,
        whose col buffer is only 27·5 channels ≈ 0.57 GB transient at
        128³) is a 4.6% step win: 272.2 vs 285.2 ms/step at 128³/base-64
        (round-3 A/B, tools/ab_train_step.py --variants auto,i2cinc;
        isolated: lax 37.4 ms vs im2col 14.0 on that conv);
      * extending to mid-width convs at spatial 16/32 measured *slower*
        end-to-end; at spatial 64 wide-channel col buffers OOM at
        compile.
    So: bottleneck convs + thin-input (cin ≤ 8) convs only.
    """
    return (max(spatial) <= 8 and min(cin, cout) >= 64) or cin <= 8
