"""3D U-Net in Flax, designed TPU-first (NDHWC, bf16 compute, remat).

Capability parity with the reference's ``models/unet3d.py:160-296``:
  * DoubleConv blocks: Conv3d(3³, pad 1) + BatchNorm + ReLU, twice
    (reference :5-55).
  * 4 encoder levels: MaxPool(2) + DoubleConv, channels
    base → 2·base → … → 16·base (reference :57-96, :197-205).
  * 4 decoder levels: ConvTranspose(2², stride 2) halving channels,
    pad-align to the skip tensor, channel-concat [skip, up], DoubleConv
    (reference :98-158, :212-218; concat order :156).
  * 1×1×1 output conv to ``n_classes`` logits (reference :222).
  * Kaiming-normal fan_out init for convs, BN γ=1 β=0 (reference :227-245).
  * ``predict`` (sigmoid probs, reference :298) and ``inference``
    (threshold 0.5 binary, reference :320) entry points.

TPU-first design decisions (not in the reference):
  * NDHWC layout — XLA tiles channels onto the lane dimension, so
    channels-last keeps 3D convs on the MXU without relayout.
  * bf16 activations/compute with fp32 params and BN statistics.
  * Per-block rematerialization: fp32 activations at 128³×64 are ~0.5 GB
    per sample per tensor; remat + bf16 make batch>1/chip feasible.
  * Cross-replica BatchNorm for free: under ``jit`` with the batch sharded
    over a 'data' mesh axis, flax's batch-stat reduction is over the
    *global* batch — XLA/GSPMD inserts the cross-replica collective, which
    is the sync the reference's per-device BN lacked (SURVEY.md §7.3.2).
  * GroupNorm alternative behind ``norm_layer='group'`` for tiny
    per-replica batches.
"""

from __future__ import annotations

import functools
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from pcmseg_tpu.models.norm import TPUBatchNorm

# Kaiming-normal, fan_out, ReLU gain — matches the reference's
# nn.init.kaiming_normal_(mode='fan_out', nonlinearity='relu').
kaiming_fan_out = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class PallasConv3x3(nn.Module):
    """Drop-in 3³ conv backed by the fused Pallas kernel (+bias+ReLU).

    Parameter names/shapes are identical to nn.Conv's ('kernel', 'bias'),
    so BN-folded checkpoints load unchanged. Inference only (no Pallas
    backward); used on TPU when the norm is folded away.
    """

    features: int
    relu: bool = True
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from pcmseg_tpu.ops.pallas.conv3d import conv3x3x3

        ci = x.shape[-1]
        kernel = self.param(
            "kernel", kaiming_fan_out, (3, 3, 3, ci, self.features),
            self.param_dtype,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), self.param_dtype
        )
        return conv3x3x3(
            x.astype(self.dtype), kernel.astype(self.dtype), bias, relu=self.relu
        )


class Im2colConv3x3(nn.Module):
    """3³ SAME conv lowered as one im2col matmul (ops/im2col.py).

    Parameter names/shapes are identical to nn.Conv ('kernel', 'bias') so
    checkpoints are interchangeable, and the math is the same dot — bf16
    outputs are bitwise-equal to the lax lowering (test-gated). Used on the
    training path where XLA's native conv backward runs at 8-20% MFU at
    these shapes; the im2col backward is 1.2-3.2× faster (BENCH.md).
    """

    features: int
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    chunk: Any = None  # depth-slab override for the chunked fallback

    @nn.compact
    def __call__(self, x):
        from pcmseg_tpu.ops.im2col import conv3x3_matmul

        ci = x.shape[-1]
        kernel = self.param(
            "kernel", kaiming_fan_out, (3, 3, 3, ci, self.features),
            self.param_dtype,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), self.param_dtype
        )
        y = conv3x3_matmul(
            x.astype(self.dtype), kernel.astype(self.dtype), self.chunk
        )
        return y + bias.astype(self.dtype)


class HybridConv3x3(nn.Module):
    """3³ SAME conv with the hybrid custom VJP (ops/hybrid_conv.py).

    Forward bytes are identical to nn.Conv's lax lowering (parameter
    names/shapes also identical), so checkpoints and serving are
    unaffected; only the backward swaps dW to the selected lowering.
    """

    features: int
    dw_impl: str = "decomp_ad"  # decomp_ad | pallas | xla
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from pcmseg_tpu.ops.hybrid_conv import conv3x3_hybrid

        ci = x.shape[-1]
        kernel = self.param(
            "kernel", kaiming_fan_out, (3, 3, 3, ci, self.features),
            self.param_dtype,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), self.param_dtype
        )
        y = conv3x3_hybrid(
            x.astype(self.dtype), kernel.astype(self.dtype), self.dw_impl
        )
        return y + bias.astype(self.dtype)


class DoubleConv3D(nn.Module):
    """(Conv3d 3³ pad 1 → Norm → ReLU) × 2."""

    features: int
    norm_layer: str = "batch"
    group_norm_groups: int = 8
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    use_pallas: bool = False
    conv_lowering: str = "auto"  # auto | lax | im2col (training path)

    @nn.compact
    def __call__(self, x, train: bool = False):
        from pcmseg_tpu.ops.hybrid_conv import should_use_hybrid
        from pcmseg_tpu.ops.im2col import (
            SERVE_CHUNK_DEPTH,
            should_use_im2col,
            should_use_im2col_serving,
        )

        for i in range(2):
            # Pallas fused conv+bias+ReLU on the folded (norm-free) serving
            # path; Ci must be lane-friendly (the 5-channel input conv and
            # training fall back to nn.Conv)
            if (
                self.use_pallas
                and self.norm_layer == "none"
                and not train
                and x.shape[-1] % 8 == 0
            ):
                x = PallasConv3x3(
                    self.features,
                    relu=True,
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name=f"conv{i}",
                )(x)
                continue
            # lowering choice (static shapes → traced once): im2col matmul
            # where the measured rule for this direction says it wins —
            # fwd+bwd rule for training, fwd-only rule for inference
            rule = should_use_im2col if train else should_use_im2col_serving
            use_i2c = self.conv_lowering == "im2col" or (
                self.conv_lowering == "auto"
                and rule(x.shape[1:4], x.shape[-1], self.features)
            )
            # hybrid custom-VJP conv (XLA fwd, swapped dW backward):
            # explicit opt-in ('hybrid' / 'hybrid_pallas') or the measured
            # auto rule (ops/hybrid_conv.should_use_hybrid)
            use_hybrid = (
                train
                and not use_i2c
                and (
                    self.conv_lowering in ("hybrid", "hybrid_pallas")
                    or (
                        self.conv_lowering == "auto"
                        and should_use_hybrid(
                            x.shape[1:4], x.shape[-1], self.features
                        )
                    )
                )
            )
            if use_hybrid:
                from pcmseg_tpu.ops import hybrid_conv as _hc

                x = HybridConv3x3(
                    self.features,
                    dw_impl=(
                        "pallas"
                        if self.conv_lowering == "hybrid_pallas"
                        else _hc.AUTO_DW_IMPL
                    ),
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name=f"conv{i}",
                )(x)
            elif use_i2c:
                x = Im2colConv3x3(
                    self.features,
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    chunk=None if train else SERVE_CHUNK_DEPTH,
                    name=f"conv{i}",
                )(x)
            else:
                x = nn.Conv(
                    self.features,
                    kernel_size=(3, 3, 3),
                    padding=1,
                    use_bias=True,
                    kernel_init=kaiming_fan_out,
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name=f"conv{i}",
                )(x)
            if self.norm_layer == "batch":
                x = TPUBatchNorm(
                    use_running_average=not train,
                    momentum=0.9,  # torch BN momentum 0.1 ≡ flax 0.9
                    epsilon=1e-5,
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name=f"norm{i}",
                )(x)
            elif self.norm_layer == "none":
                pass  # BN-folded inference graph (infer/fold_bn.py)
            else:
                x = nn.GroupNorm(
                    num_groups=min(self.group_norm_groups, self.features),
                    epsilon=1e-5,
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name=f"norm{i}",
                )(x)
            x = nn.relu(x)
        return x


class MatmulConvTranspose(nn.Module):
    """ConvTranspose(2³, stride 2, VALID) as one MXU matmul + pixel shuffle.

    With non-overlapping 2³ stride-2 windows the transposed conv IS
    ``out[n, 2d+a, 2h+b, 2w+c, co] = Σ_ci x[n,d,h,w,ci] · W[a,b,c,ci,co]``
    — a (Cin → 8·Co) matmul followed by depth-to-space. XLA lowers
    ``lax.conv_transpose`` at these shapes through an input-dilated conv
    that measured 1-9% MFU on v5e (BENCH.md round-2 profile); the matmul
    form tiles straight onto the MXU. Parameter name/shape identical to
    ``nn.ConvTranspose`` ('kernel' (2,2,2,Ci,Co), 'bias'), so checkpoints,
    the torch converter, and TP sharding specs are unchanged, and the
    output is numerically identical (gated in tests/test_model.py).
    """

    features: int
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        n, d, h, w, ci = x.shape
        kernel = self.param(
            "kernel", kaiming_fan_out, (2, 2, 2, ci, self.features),
            self.param_dtype,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), self.param_dtype
        )
        co = self.features
        # flax's conv_transpose applies the kernel spatially flipped
        # relative to the scatter form; flip so outputs match exactly
        k = kernel.astype(self.dtype)[::-1, ::-1, ::-1]
        # (2,2,2,Ci,Co) -> (Ci, 2*2*2*Co), taps ordered (a,b,c)
        k = jnp.transpose(k, (3, 0, 1, 2, 4))
        k = k.reshape(ci, 8 * co)
        y = jnp.dot(x.astype(self.dtype), k)  # (N,D,H,W,8*Co)
        y = y.reshape(n, d, h, w, 2, 2, 2, co)
        # interleave: (N, D,a, H,b, W,c, Co) -> (N, 2D, 2H, 2W, Co)
        y = jnp.transpose(y, (0, 1, 4, 2, 5, 3, 6, 7))
        y = y.reshape(n, 2 * d, 2 * h, 2 * w, co)
        return y + bias.astype(self.dtype)


def _pad_to_match(x: jnp.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
    """Zero-pad x's spatial dims (N, D, H, W, C) to match ref's.

    Same centering as the reference's F.pad alignment
    (models/unet3d.py:143-151): low side gets diff//2.
    """
    pads = [(0, 0)]
    for ax in (1, 2, 3):
        diff = ref.shape[ax] - x.shape[ax]
        pads.append((diff // 2, diff - diff // 2))
    pads.append((0, 0))
    if any(p != (0, 0) for p in pads):
        x = jnp.pad(x, pads)
    return x


class Down3D(nn.Module):
    """MaxPool(2) then DoubleConv (reference models/unet3d.py:57-96)."""

    features: int
    norm_layer: str = "batch"
    group_norm_groups: int = 8
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    use_pallas: bool = False
    conv_lowering: str = "auto"

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.max_pool(x, window_shape=(2, 2, 2), strides=(2, 2, 2))
        return _double_conv(self, x, train)


class Up3D(nn.Module):
    """ConvTranspose(2, stride 2) + pad-align + concat[skip, up] + DoubleConv.

    Reference models/unet3d.py:98-158. ``features`` is the block's output
    channel count; the transpose conv emits ``features`` channels (= in//2),
    concat doubles it, DoubleConv brings it back to ``features``.
    """

    features: int
    norm_layer: str = "batch"
    group_norm_groups: int = 8
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    use_pallas: bool = False
    conv_lowering: str = "auto"

    @nn.compact
    def __call__(self, x, skip, train: bool = False):
        x = MatmulConvTranspose(
            self.features,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="up",
        )(x)
        x = _pad_to_match(x, skip)
        x = jnp.concatenate([skip.astype(x.dtype), x], axis=-1)
        return _double_conv(self, x, train)


def _double_conv(owner, x, train: bool):
    """Instantiate the owner's DoubleConv child.

    Rematerialization happens at the whole-block level (Down3D/Up3D wrapped
    with nn.remat in UNet3D.__call__) — rematting only the DoubleConv would
    still save the ConvTranspose outputs and the (huge) concat tensors as
    backward residuals; block-level remat keeps just block inputs/outputs,
    which for the decoder's full-resolution blocks is the difference
    between ~25 GB and fitting a batch of 4 in 16 GB HBM.
    """
    return DoubleConv3D(
        features=owner.features,
        norm_layer=owner.norm_layer,
        group_norm_groups=owner.group_norm_groups,
        dtype=owner.dtype,
        param_dtype=owner.param_dtype,
        use_pallas=owner.use_pallas,
        conv_lowering=owner.conv_lowering,
        name="double_conv",
    )(x, train)


class UNet3D(nn.Module):
    """4-level 3D U-Net for multimodal volumetric segmentation.

    Input: ``(N, D, H, W, n_modalities)`` (NDHWC, channels-last for TPU).
    Output: ``(N, D, H, W, n_classes)`` float32 logits.

    Defaults mirror the reference (5 modalities, base 64 → ~90M params);
    ``n_classes`` defaults to 1 (sigmoid binary) everywhere, resolving the
    reference's n_classes=1-vs-2 split brain (SURVEY.md §8.4).
    """

    n_modalities: int = 5
    n_classes: int = 1
    base_features: int = 64
    norm_layer: str = "batch"
    group_norm_groups: int = 8
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    remat: bool = True
    use_pallas: bool = False  # fused Pallas convs on the folded serving path
    conv_lowering: str = "auto"  # training-path conv lowering (ops/im2col.py)
    # deep supervision (beyond-reference, nnU-Net-style): 1×1×1 aux heads
    # on the three coarser decoder levels; train=True then returns
    # (logits, [aux_1/2, aux_1/4, aux_1/8]) and the train step applies the
    # loss at every scale (train/steps.py DS_WEIGHTS). Inference returns
    # plain logits — the aux heads are parameterized but their outputs are
    # dead code XLA eliminates, so serving graphs and speed are unchanged.
    deep_supervision: bool = False

    def _block_kwargs(self):
        return dict(
            norm_layer=self.norm_layer,
            group_norm_groups=self.group_norm_groups,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            use_pallas=self.use_pallas,
            conv_lowering=self.conv_lowering,
        )

    @nn.compact
    def __call__(self, x, train: bool = False):
        if x.shape[-1] != self.n_modalities:
            raise ValueError(
                f"expected {self.n_modalities} input channels (NDHWC), "
                f"got shape {x.shape}"
            )
        if any(s < 16 for s in x.shape[1:4]):
            # four 2x max-pools: a dim < 16 floors to an empty bottleneck
            # tensor. The torch reference errors there; with XLA the
            # forward silently succeeds but BatchNorm over zero elements
            # makes the scale GRADIENTS NaN (mean of an empty tensor is
            # NaN, and NaN*0 backward contributions stay NaN). Caught at
            # trace time instead (core.config.MIN_INPUT_SIZE).
            raise ValueError(
                f"spatial dims {x.shape[1:4]} too small: the 4-level "
                f"U-Net needs every spatial dim >= 16"
            )
        f = self.base_features
        kw = self._block_kwargs()
        x = x.astype(self.dtype)

        if self.remat:
            # block-level remat: only block inputs/outputs survive as
            # backward residuals (skips are block outputs, so they're kept
            # once); concat/transpose/conv intermediates are recomputed.
            # static_argnums index counts self as 0.
            inc_cls = nn.remat(DoubleConv3D, static_argnums=(2,))
            down_cls = nn.remat(Down3D, static_argnums=(2,))
            up_cls = nn.remat(Up3D, static_argnums=(3,))
        else:
            inc_cls, down_cls, up_cls = DoubleConv3D, Down3D, Up3D

        x1 = inc_cls(f, name="inc", **kw)(x, train)
        x2 = down_cls(f * 2, name="down1", **kw)(x1, train)
        x3 = down_cls(f * 4, name="down2", **kw)(x2, train)
        x4 = down_cls(f * 8, name="down3", **kw)(x3, train)
        x5 = down_cls(f * 16, name="down4", **kw)(x4, train)

        def aux_head(feat, idx):
            return nn.Conv(
                self.n_classes,
                kernel_size=(1, 1, 1),
                kernel_init=kaiming_fan_out,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"ds{idx}",
            )(feat).astype(jnp.float32)

        aux = []
        x = up_cls(f * 8, name="up1", **kw)(x5, x4, train)
        if self.deep_supervision:
            aux.append(aux_head(x, 1))  # 1/8 resolution
        x = up_cls(f * 4, name="up2", **kw)(x, x3, train)
        if self.deep_supervision:
            aux.append(aux_head(x, 2))  # 1/4 resolution
        x = up_cls(f * 2, name="up3", **kw)(x, x2, train)
        if self.deep_supervision:
            aux.append(aux_head(x, 3))  # 1/2 resolution
        x = up_cls(f, name="up4", **kw)(x, x1, train)

        logits = nn.Conv(
            self.n_classes,
            kernel_size=(1, 1, 1),
            kernel_init=kaiming_fan_out,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="outc",
        )(x).astype(jnp.float32)
        if self.deep_supervision and train:
            # fine -> coarse, matching train/steps.py's DS_WEIGHTS order
            return logits, aux[::-1]
        return logits

    def predict(self, x):
        """Class probabilities (reference models/unet3d.py:298-318):
        sigmoid for the binary head, softmax over channels when
        ``n_classes >= 2`` (the reference built n_classes=2 models from
        its CLI but had no multi-class activation anywhere — SURVEY.md
        §8.4; here it is a real capability)."""
        logits = self(x, train=False)
        if self.n_classes >= 2:
            return jax.nn.softmax(logits, axis=-1)
        return jax.nn.sigmoid(logits)

    def inference(self, x, threshold: float = 0.5):
        """Binary mask at ``threshold`` (reference models/unet3d.py:320-344),
        or the argmax label map for multi-class heads (float, values
        0..K-1, keeping the trailing channel dim)."""
        probs = self.predict(x)
        if self.n_classes >= 2:
            return jnp.argmax(probs, axis=-1)[..., None].astype(jnp.float32)
        return (probs > threshold).astype(jnp.float32)

    # ---- convenience constructors -----------------------------------------

    @classmethod
    def from_config(cls, config) -> "UNet3D":
        return cls(
            n_modalities=config.n_modalities,
            n_classes=config.n_classes,
            base_features=config.base_features,
            norm_layer=config.norm_layer,
            group_norm_groups=config.group_norm_groups,
            dtype=jnp.dtype(config.compute_dtype),
            param_dtype=jnp.dtype(config.param_dtype),
            remat=config.remat,
            conv_lowering=getattr(config, "conv_lowering", "auto"),
            deep_supervision=getattr(config, "deep_supervision", False),
        )

    def init_variables(self, rng, input_shape: Tuple[int, ...] = None):
        """Initialize params + batch_stats with a dummy batch.

        ``input_shape`` defaults to a minimal (1, 16, 16, 16, n_modalities)
        volume — init is shape-polymorphic for any spatial size divisible
        by 16.
        """
        shape = input_shape or (1, 16, 16, 16, self.n_modalities)
        dummy = jnp.zeros(shape, self.param_dtype)
        return self.init({"params": rng}, dummy, train=False)


def param_count(variables) -> int:
    return sum(p.size for p in jax.tree.leaves(variables["params"]))


apply_predict = functools.partial(UNet3D.apply, method=UNet3D.predict)
apply_inference = functools.partial(UNet3D.apply, method=UNet3D.inference)
