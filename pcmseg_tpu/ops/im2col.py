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


# ---------------------------------------------------------------------------
# Depth-chunked variant: the same matmul lowering with the col buffer
# materialized one depth slab at a time (1-voxel depth halo, so every
# output voxel still sees its full 3³ window) — chunk/D of the monolithic
# transient. Outputs are bitwise-equal to the monolithic lowering (same
# per-voxel dot), hence to lax conv in bf16.
#
# Measured verdict (BENCH.md round-3 addendum, tools/bench_conv_chunked.py
# + tools/ab_train_step.py --variants auto,i2cwide):
#   * As a lowering for the WIDE 128³ convs (64→64 / 128→64, monolithic
#     col buffers 7-15 GB): RETIRED. The chunked forward beats lax 1.3×
#     isolated, but the backward's 27× patch recompute gives it all back
#     (fwd+bwd 60-69 ms vs lax's 47.3 at 128³×64→64), and the in-model
#     arm fails the remote AOT compile outright.
#   * As the PRODUCTION fallback behind `conv3x3_matmul` for the thin
#     (cin ≤ 8) convs at crops beyond 128, where the monolithic col
#     buffer crosses ~1 GB: kept. This is what makes the measured
#     `cin <= 8` auto-rule win (BENCH.md, +4.6% step) safe at any
#     crop_size instead of tying it to 128³.
# ---------------------------------------------------------------------------


def _im2col_hw(slab: jnp.ndarray) -> jnp.ndarray:
    """Depth-haloed slab (N,S+2,H,W,C) → (N,S,H,W,27C) patches.

    The slab already carries the ±1 depth halo; only H/W get SAME padding
    here. Offset order (depth-major a,b,c) matches `_im2col` and the
    kernel reshape (3,3,3,Ci,Co) → (27·Ci, Co).
    """
    n, sp2, h, w, c = slab.shape
    s = sp2 - 2
    xp = jnp.pad(slab, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))
    slabs = [
        xp[:, a : a + s, b : b + h, c_ : c_ + w, :]
        for a in range(3)
        for b in range(3)
        for c_ in range(3)
    ]
    return jnp.concatenate(slabs, axis=-1)


def _fold_hw(cols: jnp.ndarray, c: int) -> jnp.ndarray:
    """Adjoint of `_im2col_hw`: (N,S,H,W,27C) → depth-haloed (N,S+2,H,W,C)."""
    n, s, h, w, _ = cols.shape
    xp = jnp.zeros((n, s + 2, h + 2, w + 2, c), cols.dtype)
    i = 0
    for a in range(3):
        for b in range(3):
            for c_ in range(3):
                xp = xp.at[:, a : a + s, b : b + h, c_ : c_ + w, :].add(
                    cols[..., i * c : (i + 1) * c]
                )
                i += 1
    return xp[:, :, 1:-1, 1:-1, :]


def _chunk_starts(d: int, chunk: int):
    return list(range(0, d, chunk))


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv3x3_im2col_chunked(
    x: jnp.ndarray, w: jnp.ndarray, chunk: int = 16
) -> jnp.ndarray:
    """SAME pad-1 3³ conv as per-depth-slab im2col matmuls.

    Same math (and bf16 bytes) as `conv3x3_im2col`, but the col buffer is
    materialized one depth slab at a time — chunk/D of the monolithic
    transient, which is what makes the matmul form affordable at
    128³ with 64-128 input channels.
    """
    ci, co = w.shape[3], w.shape[4]
    k = w.reshape(27 * ci, co)
    d = x.shape[1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    outs = []
    for c0 in _chunk_starts(d, chunk):
        s = min(chunk, d - c0)
        slab = jax.lax.slice_in_dim(xp, c0, c0 + s + 2, axis=1)
        outs.append(jnp.dot(_im2col_hw(slab), k))
    return jnp.concatenate(outs, axis=1)


def _chunked_fwd(x, w, chunk):
    return conv3x3_im2col_chunked(x, w, chunk), (x, w)


def _chunked_bwd(chunk, res, dy):
    x, w = res
    n, d, h, wd, ci = x.shape
    co = w.shape[4]
    # dW: Σ_slabs Pᵀ dy  (per-slab bf16 matmul, fp32 accumulation across
    # slabs so the chunked sum doesn't lose the monolithic dot's MXU-fp32
    # accumulator precision). This is the half of XLA's conv backward
    # that's pathological at wide 128³ shapes (its isolated compile
    # allocates a 32 GB layout copy; BENCH.md round-2 dW table).
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    dw = jnp.zeros((27 * ci, co), jnp.float32)
    for c0 in _chunk_starts(d, chunk):
        s = min(chunk, d - c0)
        slab = jax.lax.slice_in_dim(xp, c0, c0 + s + 2, axis=1)
        patches = _im2col_hw(slab)  # recomputed, transient
        dy_c = jax.lax.slice_in_dim(dy, c0, c0 + s, axis=1)
        dw = dw + jnp.dot(
            patches.reshape(-1, 27 * ci).T, dy_c.reshape(-1, co)
        ).astype(jnp.float32)
    # dx: XLA's input-gradient conv is NOT the pathology (5.5 ms isolated
    # at 128³×64→64, BENCH.md) — a SAME conv of dy with the spatially
    # flipped, IO-transposed kernel beats the fold-based col2im (which
    # measured 27×-scatter bandwidth-bound: 59 vs 47 ms fwd+bwd total).
    w_flip = jnp.flip(w, axis=(0, 1, 2)).transpose(0, 1, 2, 4, 3)
    dx = jax.lax.conv_general_dilated(
        dy, w_flip.astype(dy.dtype), (1, 1, 1),
        ((1, 1), (1, 1), (1, 1)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    return dx, dw.astype(dy.dtype).reshape(w.shape)


conv3x3_im2col_chunked.defvjp(_chunked_fwd, _chunked_bwd)


# Largest transient col buffer the monolithic lowering may materialize
# before the dispatcher switches to depth-chunked slabs. 1 GB keeps the
# 128³ cin≤8 inc conv (0.57 GB) and every bottleneck conv monolithic
# (matching the round-2/3 measured configuration exactly) and chunks only
# the wide large-spatial convs whose monolithic buffers are 7-15 GB.
MONO_COL_BUDGET_BYTES = 1 << 30
CHUNK_DEPTH = 16
# Forward-only (serving) slab: the chunked *forward* is fastest at slab 8
# (4.8 ms vs 6.1 at slab 16, 128³×64→64 — BENCH.md round-3 addendum 2);
# training keeps slab 16, where the dW recompute amortizes better.
SERVE_CHUNK_DEPTH = 8


def conv3x3_matmul(
    x: jnp.ndarray, w: jnp.ndarray, chunk: int | None = None
) -> jnp.ndarray:
    """im2col matmul conv, monolithic or depth-chunked by col-buffer size."""
    if chunk is None:
        chunk = CHUNK_DEPTH
    voxels = x.shape[0] * x.shape[1] * x.shape[2] * x.shape[3]
    col_bytes = voxels * 27 * x.shape[-1] * x.dtype.itemsize
    if col_bytes <= MONO_COL_BUDGET_BYTES or x.shape[1] <= chunk:
        return conv3x3_im2col(x, w)
    return conv3x3_im2col_chunked(x, w, chunk)


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


def should_use_im2col_serving(spatial: tuple, cin: int, cout: int) -> bool:
    """Measured decision rule for the inference/serving forward: lax
    everywhere.

    Serving has no backward, so the training rule above doesn't transfer —
    the candidates were re-measured in the real folded-BN serving graph at
    128³/base-64 (tools/ab_serve_forward.py; BENCH.md "Serving-forward
    lowering A/B"). Every im2col arm LOSES in-graph despite winning
    isolated (the established inversion pattern): production lax 61.8
    ms/vol vs thin-conv arm 70.8, bottleneck arm 62.1, training-rule arms
    69.4, chunked wide-conv arm 159.6, all-arms 145.7. XLA fuses the
    serving forward aggressively and every matmul-form materialization
    boundary costs more than the conv it replaces. Flip an arm here only
    with a new A/B row behind it.
    """
    return False
