"""Pallas TPU kernel: fused 3x3x3 convolution + bias + ReLU (inference).

The 3³ stride-1 convs are where all of this model's FLOPs live
(18 of 22 conv layers; reference models/unet3d.py:29,35). This kernel
formulates the conv as 27 shifted MXU matmuls over VMEM-resident slices,
fusing bias-add and ReLU into the accumulator epilogue — the Pallas-fused
conv block SURVEY.md §7.1.3 plans for, available to the BN-folded serving
path behind ``config.pallas_inference``.

Measured on v5e (standalone, bf16):
  * 64³/128ch:  4.5 ms vs XLA 8.3 ms (1.85x, 51 vs 28 TFLOPS)
  * 32³/256ch:  2.7 ms vs XLA 5.4 ms (2.0x, 43 vs 21 TFLOPS)
  * 128³/64ch:  parity (chunked)
Inside the full U-Net, however, XLA's cross-op fusion (pad/bias/relu folded
into its conv loops, no pallas_call materialization boundaries) still wins:
61 ms/vol vs 103 ms/vol at 128³. Hence opt-in, not default — standalone
deployments of single conv blocks benefit; the full serving graph doesn't
yet. Closing that gap (fusing pad into the kernel's DMA and chaining
DoubleConv stages in VMEM) is future work.

Layout and tiling:
  * Input is zero-padded once host-side; the kernel sees pre-padded data,
    so there are no boundary branches.
  * Grid (N, D). Halo in z is expressed by passing the padded array three
    times with z-shifted index maps (block = one full (Hc+2, W+2, Ci)
    slice each) — overlapping windows without manual DMA.
  * VMEM: Pallas double-buffers in/out blocks, so a whole 128²-slice
    working set (~21 MB) would overflow the ~16 MB VMEM. The dispatcher
    splits big volumes into H-chunks sliced from the *already padded*
    array (so chunk boundaries carry real halo rows, not zeros) and
    concatenates the outputs — ~3% duplicated halo compute, no extra
    kernel variant.
  * Inner loop: 27 matmuls of (Hc·W, Ci) x (Ci, Co) with fp32 VMEM
    accumulation; epilogue max(acc + b, 0) cast to the output dtype.

Numerics are gated against lax.conv in tests (interpret mode on CPU,
compiled on TPU).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x0_ref, x1_ref, x2_ref, w_ref, b_ref, out_ref, acc_ref, *, relu):
    hpad, wpad, ci = x0_ref.shape[2:]
    h, w_out = hpad - 2, wpad - 2
    co = w_ref.shape[-1]

    acc_ref[:] = jnp.zeros_like(acc_ref)
    for dz, slab_ref in enumerate((x0_ref, x1_ref, x2_ref)):
        slab = slab_ref[0, 0]  # (Hc+2, W+2, Ci)
        for dy in range(3):
            rows = slab[dy : dy + h, :, :]
            for dx in range(3):
                window = rows[:, dx : dx + w_out, :].reshape(h * w_out, ci)
                k = w_ref[dz * 9 + dy * 3 + dx, :, :]
                acc_ref[:] += jnp.dot(
                    window, k, preferred_element_type=jnp.float32
                )
    result = acc_ref[:] + b_ref[0, :].astype(jnp.float32)
    if relu:
        result = jnp.maximum(result, 0.0)
    out_ref[:] = result.reshape(1, 1, h, w_out, co).astype(out_ref.dtype)


def _whole_slice_call(xp, w27, b, relu, interpret):
    """Run the kernel on a pre-padded (N, D+2, Hc+2, W+2, Ci) chunk."""
    n, dpad, hpad, wpad, ci = xp.shape
    d, h, wdim = dpad - 2, hpad - 2, wpad - 2
    co = w27.shape[-1]

    def spec(dz):
        return pl.BlockSpec(
            (1, 1, hpad, wpad, ci),
            functools.partial(
                lambda ni, zi, off: (ni, zi + off, 0, 0, 0), off=dz
            ),
            memory_space=pltpu.VMEM,
        )

    return pl.pallas_call(
        functools.partial(_kernel, relu=relu),
        grid=(n, d),
        in_specs=[
            spec(0),
            spec(1),
            spec(2),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w27
            pl.BlockSpec((1, co), lambda *_: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, h, wdim, co),
            lambda ni, zi: (ni, zi, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, d, h, wdim, co), xp.dtype),
        scratch_shapes=[pltpu.VMEM((h * wdim, co), jnp.float32)],
        interpret=interpret,
    )(xp, xp, xp, w27, b[None, :])


# one (Hc+2)(W+2)Ci slice (bytes) above which H gets chunked; with Pallas'
# double buffering the whole-slice working set is ~3x slice + fp32 acc +
# 2x out, which overflows ~16MB VMEM for 128^2 x 64ch slices.
_SLICE_BYTES_LIMIT = 66 * 66 * 128 * 2
_CHUNK_H = 32
# the full (27, Ci, Co) weight lives in VMEM; past this it can't
# (1024x512 would need 28MB) — those bottleneck layers carry <5% of the
# model FLOPs, so they fall back to XLA's conv.
_WEIGHT_BYTES_LIMIT = 8 * 1024 * 1024


@functools.partial(jax.jit, static_argnames=("relu", "interpret", "chunk_large"))
def conv3x3x3(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
    relu: bool = True,
    interpret: bool = False,
    chunk_large: bool = False,
) -> jnp.ndarray:
    """Fused pad-1 stride-1 3³ conv + bias + ReLU over NDHWC.

    Args:
      x: (N, D, H, W, Ci).
      w: flax-layout kernel (3, 3, 3, Ci, Co).
      b: (Co,) bias (e.g. carrying the folded BN affine); zeros if None.
      relu: fuse max(., 0) into the epilogue.
    """
    n, d, h, wdim, ci = x.shape
    if w.shape[:3] != (3, 3, 3) or w.shape[3] != ci:
        raise ValueError(f"kernel must be (3,3,3,{ci},Co), got {w.shape}")
    co = w.shape[-1]
    if 27 * ci * co * x.dtype.itemsize > _WEIGHT_BYTES_LIMIT:
        return conv3x3x3_reference(x, w, b, relu=relu)
    b = jnp.zeros((co,), jnp.float32) if b is None else b.astype(jnp.float32)

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    w27 = w.reshape(27, ci, co).astype(x.dtype)

    slice_bytes = (h + 2) * (wdim + 2) * ci * x.dtype.itemsize
    if slice_bytes <= _SLICE_BYTES_LIMIT or h <= _CHUNK_H:
        return _whole_slice_call(xp, w27, b, relu, interpret)

    if not chunk_large:
        # measured in-model: XLA's conv beats the H-chunked pallas path at
        # full resolution (the pad/concat HBM copies and lost fusion eat
        # the kernel's standalone parity) — so big slices go to XLA and
        # pallas serves the mid/deep levels where it wins 1.8-2x
        return conv3x3x3_reference(x, w, b, relu=relu)

    # chunk H from the padded array: each chunk's boundary rows are the
    # real neighbor rows (not zeros), so results match the unchunked conv
    chunks = []
    for h0 in range(0, h, _CHUNK_H):
        hc = min(_CHUNK_H, h - h0)
        xp_chunk = xp[:, :, h0 : h0 + hc + 2, :, :]
        chunks.append(_whole_slice_call(xp_chunk, w27, b, relu, interpret))
    return jnp.concatenate(chunks, axis=2)


# back-compat aliases used in tests/benchmarks
conv3x3x3_bias_act = conv3x3x3


def conv3x3x3_reference(x, w, b=None, relu=True):
    """lax.conv reference implementation (same math, XLA-lowered)."""
    out = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(1, 1, 1),
        padding=((1, 1), (1, 1), (1, 1)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        out = out + b.astype(jnp.float32)
    if relu:
        out = jnp.maximum(out, 0.0)
    return out.astype(x.dtype)
