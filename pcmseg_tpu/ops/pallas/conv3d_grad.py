"""Pallas TPU kernel: 3x3x3 conv weight gradient (dL/dW) as MXU matmuls.

Why a hand-written dW: the train step's gap to the forward's ~31% MFU is
the conv backward (~17% overall, BENCH.md round-2 profile), and of the two
gradient computations the weight gradient is the mis-shaped one for XLA's
conv emitter — it is a contraction of the *entire volume* (K = N*D*H*W
voxels) onto a tiny (27*Ci, Co) output. Formulated directly, that is 27
well-shaped MXU matmuls per (n, z) slice:

    dW[a,b,c] += window(x_pad, a,b,c)^T @ dy        (Ci x V) @ (V x Co)

with fp32 accumulation in a VMEM-resident (27, Ci, Co) output block that
persists across the sequential TPU grid (constant out index map).

Layout/tiling (mirrors ops/pallas/conv3d.py's forward):
  * x is zero-padded once outside; the kernel sees pre-padded data — the
    three z-shifted slabs arrive as three refs with offset index maps.
  * Grid (N, D): one padded (Hc+2, W+2, Ci) slab triple + one (Hc, W, Co)
    dy slice per step. Big volumes are H-chunked at the dispatcher from
    the padded array (real halo rows) and the per-chunk dW summed.
  * Inner loop: 27 dot_generals contracting (h, w) — no patch-matrix
    copies; Mosaic streams the shifted windows straight into the MXU.

dL/dx needs no new kernel: it is itself a 3x3x3 conv of the padded dy with
the spatially-flipped, in/out-transposed kernel — exactly what XLA's conv
or the existing Pallas forward kernel already compute. The production
custom-VJP conv that combines these lives in ops/hybrid_conv.py.

Numerics are gated against jax.grad-of-lax-conv in tests (interpret mode
on CPU, compiled on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dw_kernel(x0_ref, x1_ref, x2_ref, dy_ref, dw_ref):
    """One (n, z) step: accumulate 27 windowed matmuls into dw_ref.

    x*_ref: (1, 1, Hc+2, W+2, Ci) padded input slabs at z, z+1, z+2.
    dy_ref: (1, 1, Hc, W, Co) output-gradient slice.
    dw_ref: (27, Ci, Co) fp32 accumulator (constant index map — the block
            stays resident in VMEM across the sequential grid).
    """
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    hc, w = dy_ref.shape[2:4]
    co = dy_ref.shape[-1]
    ci = x0_ref.shape[-1]
    # 2-D operands with a single contracting dim — Mosaic's tpu.matmul
    # rejects multi-dim contractions ("lhs contracting dims must be of
    # size 1"), so flatten (Hc, W) -> V before the dot.
    dy2 = dy_ref[0, 0].reshape(hc * w, co)  # (V, Co), contiguous
    for dz, slab_ref in enumerate((x0_ref, x1_ref, x2_ref)):
        slab = slab_ref[0, 0]  # (Hc+2, W+2, Ci)
        for dy_off in range(3):
            rows = slab[dy_off : dy_off + hc, :, :]
            for dx_off in range(3):
                window = rows[:, dx_off : dx_off + w, :].reshape(hc * w, ci)
                contrib = jax.lax.dot_general(
                    window,
                    dy2,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (Ci, Co)
                idx = dz * 9 + dy_off * 3 + dx_off
                dw_ref[idx, :, :] += contrib


def _dw_call(xp, dy, interpret):
    """dW over one pre-padded chunk: xp (N, D+2, Hc+2, W+2, Ci), dy
    (N, D, Hc, W, Co) → (27, Ci, Co) fp32."""
    n, dpad, hpad, wpad, ci = xp.shape
    d, hc, w = dy.shape[1:4]
    co = dy.shape[-1]

    def xspec(dz):
        return pl.BlockSpec(
            (1, 1, hpad, wpad, ci),
            functools.partial(
                lambda ni, zi, off: (ni, zi + off, 0, 0, 0), off=dz
            ),
            memory_space=pltpu.VMEM,
        )

    return pl.pallas_call(
        _dw_kernel,
        grid=(n, d),
        in_specs=[
            xspec(0),
            xspec(1),
            xspec(2),
            pl.BlockSpec(
                (1, 1, hc, w, co),
                lambda ni, zi: (ni, zi, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (27, ci, co), lambda ni, zi: (0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((27, ci, co), jnp.float32),
        interpret=interpret,
    )(xp, xp, xp, dy)


# one padded (Hc+2)(W+2)Ci slab (bytes) above which H gets chunked. The
# VMEM working set is 3 slabs x2 (double buffering) + dy block x2 + the
# fp32 (27,Ci,Co) accumulator PLUS Mosaic stack temporaries for the
# window reshapes (~2 window-sized buffers live at a time) — measured: a
# 1.05 MB slab limit ran 17.15M scoped VMEM at 128³ (1.15M over budget),
# so the limit sits at ~0.57 MB/slab (Hc=32 at 128³, ~9M scoped).
_SLAB_BYTES_LIMIT = 34 * 130 * 64 * 2
_MIN_CHUNK_H = 8


def _pick_chunk_h(h: int, w: int, ci: int, itemsize: int):
    """Largest H-chunk whose padded slab fits the VMEM budget.

    Chunks no finer than _MIN_CHUNK_H, but a volume whose WHOLE height
    is already below that (the model's deep layers: 4³/2³ spatials with
    wide channels) is accepted un-chunked when its slab fits — the old
    ``while hc >= _MIN_CHUNK_H`` loop never even tested those shapes,
    which is what the round-2-4 "in-model compile failure" actually was
    (tools/repro_pallas_aot.py rung 3/4; misattributed to the remote
    AOT until the round-5 ladder recorded the real error)."""
    hc = h
    while True:
        if (hc + 2) * (w + 2) * ci * itemsize <= _SLAB_BYTES_LIMIT:
            return hc
        if hc <= _MIN_CHUNK_H:
            return None
        hc //= 2


@functools.partial(jax.jit, static_argnames=("interpret",))
def conv3x3_dw(
    x: jnp.ndarray, dy: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """Weight gradient of a SAME pad-1 stride-1 3³ conv.

    Args:
      x:  (N, D, H, W, Ci) forward input (bf16 or fp32).
      dy: (N, D, H, W, Co) output gradient (same dtype).
    Returns:
      (3, 3, 3, Ci, Co) fp32 gradient, matching
      ``jax.grad(lambda w: conv(x, w).sum())`` up to accumulation order.
    """
    n, d, h, w, ci = x.shape
    co = dy.shape[-1]
    if dy.shape[:4] != (n, d, h, w):
        raise ValueError(f"x {x.shape} / dy {dy.shape} spatial mismatch")

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))

    hc = _pick_chunk_h(h, w, ci, x.dtype.itemsize)
    if hc is None:
        raise ValueError(
            f"slab too large for VMEM even H-chunked: {x.shape}"
        )

    if hc == h:
        dw27 = _dw_call(xp, dy, interpret)
    else:
        dw27 = jnp.zeros((27, ci, co), jnp.float32)
        for h0 in range(0, h, hc):
            hcn = min(hc, h - h0)
            dw27 = dw27 + _dw_call(
                xp[:, :, h0 : h0 + hcn + 2, :, :],
                dy[:, :, h0 : h0 + hcn, :, :],
                interpret,
            )
    return dw27.reshape(3, 3, 3, ci, co)


def conv3x3_dw_reference(x, dy):
    """jax.grad-of-lax-conv reference (same math, XLA-lowered)."""

    def loss(w):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), ((1, 1), (1, 1), (1, 1)),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32,
        )
        return jnp.sum(y * dy.astype(jnp.float32))

    ci, co = x.shape[-1], dy.shape[-1]
    w0 = jnp.zeros((3, 3, 3, ci, co), x.dtype)
    return jax.grad(loss)(w0).astype(jnp.float32)
