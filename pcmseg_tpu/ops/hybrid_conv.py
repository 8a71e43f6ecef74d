"""Hybrid 3x3x3 conv: XLA forward, hand-picked backward lowerings.

The training step's MFU ceiling is the conv backward (BENCH.md): XLA's
forward conv at this model's shapes is competitive (and fuses with the
surrounding bias/BN/ReLU), but its backward pair — dx (a conv of the
padded dy with the flipped/transposed kernel) and dW (a whole-volume
contraction onto (27*Ci, Co)) — is where the step loses its MFU.

This op keeps the forward byte-identical to ``lax.conv_general_dilated``
(so checkpoints, parity tests, and serving are untouched) and swaps ONLY
the backward:

  * dx: XLA's conv on the transformed kernel — conv-shaped, stays native.
  * dW: selectable lowering (``dw_impl``):
      - 'xla'       native AD (conv_grad_weights),
      - 'pallas'    the windowed-matmul kernel (ops/pallas/conv3d_grad.py),
      - 'decomp_ad' AD of the depth-decomposed form: dx/dW of a 3³ conv
        via three (1,3,3) convs over z-shifted inputs, which XLA emits as
        well-tiled 2-D conv gradients.

The decision of *where* to use which is measured (isolated A/B in
tools/bench_conv_grad_split.py, then end-to-end train-step A/B),
mirroring ops/im2col.py's methodology — isolated-op wins at lowering
boundaries routinely invert inside the full XLA graph.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _lax_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), ((1, 1), (1, 1), (1, 1)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


def conv2d_decomp(x, w):
    """The same 3³ SAME conv as three shifted (1,3,3)-kernel convs.

    Mathematically identical to ``_lax_conv`` (bf16 outputs bitwise-equal,
    test-gated); exists for its AD: XLA's *2-D* conv gradients tile onto
    the MXU 3-6x faster than the 3-D ones at this model's shapes
    (tools/bench_conv2d_decomp.py with a real cotangent: 64³x128ch
    dx+dw 7.6 ms vs 44 ms; at 128³ the isolated 3-D backward does not
    even compile through the tunnel).
    """
    d = x.shape[1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    y = None
    for a in range(3):
        ya = jax.lax.conv_general_dilated(
            xp[:, a : a + d], w[a : a + 1], (1, 1, 1),
            ((0, 0), (1, 1), (1, 1)),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        y = ya if y is None else y + ya
    return y


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv3x3_hybrid(x: jnp.ndarray, w: jnp.ndarray, dw_impl: str = "decomp_ad"):
    """SAME pad-1 3³ conv, (N,D,H,W,Ci) × (3,3,3,Ci,Co) → (N,D,H,W,Co).

    Forward is exactly the lax conv; only the VJP differs (``dw_impl``):
      - 'decomp_ad': dx and dW via AD of the depth-decomposed form
        (three 2-D conv gradients each) — the measured winner.
      - 'pallas': dW from the windowed-matmul kernel, dx native.
      - 'xla': native 3-D AD for both (A/B baseline).
    """
    return _lax_conv(x, w)


def _fwd(x, w, dw_impl):
    return _lax_conv(x, w), (x, w)


def _bwd(dw_impl, res, dy):
    x, w = res
    dy = dy.astype(x.dtype)
    if dw_impl == "decomp_ad":
        _, vjp = jax.vjp(conv2d_decomp, x, w.astype(x.dtype))
        dx, dw = vjp(dy)
        return dx.astype(x.dtype), dw.astype(w.dtype)
    # dx: conv of dy with the spatially-flipped, Ci<->Co-swapped kernel —
    # conv-shaped, so XLA's native emitter handles it.
    wt = jnp.transpose(w[::-1, ::-1, ::-1], (0, 1, 2, 4, 3))  # (3,3,3,Co,Ci)
    dx = _lax_conv(dy, wt.astype(dy.dtype)).astype(x.dtype)
    if dw_impl == "pallas":
        from pcmseg_tpu.ops.pallas.conv3d_grad import conv3x3_dw

        dw = conv3x3_dw(x, dy)
    elif dw_impl == "xla":
        # the cotangent must match the primal output dtype (bf16 under
        # the production compute dtype)
        primal, vjp = jax.vjp(lambda wc: _lax_conv(x, wc), w)
        (dw,) = vjp(dy.astype(primal.dtype))
    else:
        raise ValueError(
            f"unknown dw_impl {dw_impl!r}; expected "
            "'decomp_ad', 'pallas', or 'xla'"
        )
    return dx, dw.astype(w.dtype)


conv3x3_hybrid.defvjp(_fwd, _bwd)


# dW implementation used when the AUTO rule (below) selects the hybrid
# conv; 'hybrid_pallas' as an explicit conv_lowering always forces
# 'pallas'. Module-level so the A/B harness can patch it.
AUTO_DW_IMPL = "decomp_ad"


def should_use_hybrid(spatial: tuple, cin: int, cout: int) -> bool:
    """Measured decision rule for the training path: never, by evidence.

    The end-to-end train-step A/B landed (BENCH.md "Conv backward
    lowerings", tools/ab_train_step.py at 128³/base-64 on v5e): every
    hybrid arm loses in the full graph despite isolated-op wins —
    ``hybrid`` (decomp_ad everywhere) 321.3 ms vs ``auto`` 286.8 ms;
    selective decomp_ad at spatial 16-64 (``sel64``) 289.1 ms and at
    16-32 (``sel32``) 287.5 ms — inside noise of auto at best; the
    Pallas-dW arm ``selp32`` 343.7 ms, and ``selp64``/``hybrid_pallas``
    fail the remote AOT in-model at 128³. XLA schedules the native 3-D
    backward into the surrounding graph better than any hand-swapped
    VJP at these shapes, so the auto rule keeps hybrid off the training
    path permanently. Re-run tools/ab_train_step.py
    --variants auto,hybrid,sel32 before changing this.
    """
    return False
