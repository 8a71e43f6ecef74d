"""Jitted train/eval steps: value_and_grad + optax, global-batch losses.

The TPU-native core of what the reference spreads across four trainer
classes (utils/trainer.py:160-234, train_bph.py:127-200,
train_bph_optimized.py:255-345): one traced-once train step doing
fwd → loss → bwd → clip → Adam(+wd) → BN-stat update, and one eval step
returning loss plus per-sample Dice/IoU.

Optimizer parity with the reference:
  * Adam(lr, betas=(0.9, 0.999), eps=1e-8) with torch-style weight_decay
    1e-5 (decay added to the gradient *before* the Adam moments —
    optax.add_decayed_weights placed before scale_by_adam).
  * Global-norm gradient clipping at 1.0 (reference train_bph.py:166).
  * The learning rate is an injected hyperparameter living in the optimizer
    state so the host-side ReduceLROnPlateau can change it between epochs
    without retracing (see pcmseg_tpu/train/schedule.py).

Mixed precision: the model computes in bf16 (no loss scaling needed on TPU,
unlike the reference's CUDA-AMP GradScaler at train_bph_optimized.py:248);
params, optimizer moments, BN stats, and the loss reduction stay fp32.

Label/output shape reconciliation mirrors the reference CV trainer
(train_bph_optimized.py:272-291): channel-dim unsqueeze and nearest-neighbor
resize of labels to the logits' spatial shape, done with static shapes so it
is jit-compatible.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.training import train_state

from pcmseg_tpu.ops.losses import make_loss_fn
from pcmseg_tpu.ops.metrics import EPS


# Deep-supervision loss weights, full-res first then the 1/2, 1/4, 1/8
# aux heads (models/unet3d.py deep_supervision=True). Geometric halving
# normalized to sum to 1 — nnU-Net's scheme — so the reported loss stays
# on the same scale as single-output training.
DS_WEIGHTS = (8 / 15, 4 / 15, 2 / 15, 1 / 15)


class TrainState(train_state.TrainState):
    """Flax TrainState extended with BatchNorm running statistics and an
    optional EMA (Polyak average) of the params ({} when ema_decay=0)."""

    batch_stats: Any = struct.field(default_factory=dict)
    ema_params: Any = struct.field(default_factory=dict)


def _adam_chain(
    learning_rate,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 1e-5,
    grad_clip_norm: float = 1.0,
):
    parts = []
    if grad_clip_norm and grad_clip_norm > 0:
        parts.append(optax.clip_by_global_norm(grad_clip_norm))
    if weight_decay and weight_decay > 0:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
    parts.append(optax.scale(-1.0))
    parts.append(optax.scale(learning_rate))
    return optax.chain(*parts)


def make_optimizer(config) -> optax.GradientTransformation:
    if config.optimizer != "adam":
        raise ValueError(f"unsupported optimizer: {config.optimizer!r}")
    return optax.inject_hyperparams(
        _adam_chain,
        static_args=("b1", "b2", "eps", "weight_decay", "grad_clip_norm"),
    )(
        learning_rate=config.learning_rate,
        b1=config.betas[0],
        b2=config.betas[1],
        eps=config.eps,
        weight_decay=config.weight_decay,
        grad_clip_norm=config.grad_clip_norm,
    )


def get_learning_rate(state: TrainState) -> float:
    return float(state.opt_state.hyperparams["learning_rate"])


def set_learning_rate(state: TrainState, lr: float) -> TrainState:
    """Functionally update the injected learning rate (no retrace).

    The replacement keeps a mesh-placed old leaf's sharding: under a
    multi-host mesh the LR must stay a *global* replicated array (a plain
    host-side ``jnp.asarray`` is single-device, which Orbax refuses to
    serialize in multi-process settings). Every process computes the same
    ``lr`` from the same deterministic scheduler, so the callback-built
    global array is consistent. A leaf that was never mesh-placed (no
    ``shard_state`` — plain library use of create_train_state) is rebuilt
    with plain ``jnp.asarray``: the callback path would commit it to a
    device, and a committed-vs-uncommitted input is a different jit cache
    key — i.e. it would silently retrace the train step once.
    """
    import numpy as np
    from jax.sharding import NamedSharding

    hp = dict(state.opt_state.hyperparams)
    old = hp["learning_rate"]
    dtype = jnp.asarray(old).dtype
    sharding = getattr(old, "sharding", None)
    if isinstance(sharding, NamedSharding):
        value = np.asarray(lr, dtype=dtype)
        hp["learning_rate"] = jax.make_array_from_callback(
            (), sharding, lambda idx: value
        )
    else:
        hp["learning_rate"] = jnp.asarray(lr, dtype=dtype)
    return state.replace(opt_state=state.opt_state._replace(hyperparams=hp))


def create_train_state(
    config,
    rng: jax.Array,
    model=None,
    input_shape=None,
) -> TrainState:
    """Initialize model variables + optimizer into a TrainState."""
    from pcmseg_tpu.models import UNet3D

    model = model or UNet3D.from_config(config)
    variables = model.init_variables(rng, input_shape)
    params = variables["params"]
    # EMA starts as a COPY of the init params (fresh buffers: with state
    # donation, aliased leaves would be donated twice on the first step)
    ema = (
        jax.tree.map(jnp.copy, params)
        if getattr(config, "ema_decay", 0.0) > 0
        else {}
    )
    return TrainState.create(
        apply_fn=model.apply,
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        ema_params=ema,
        tx=make_optimizer(config),
    )


def align_labels(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Reconcile label shape with logits (reference train_bph_optimized.py:272-291).

    Adds the trailing channel dim if missing, then nearest-neighbor-resizes
    the spatial dims to match the logits. All shapes are static under jit.
    """
    if labels.ndim == logits.ndim - 1:
        labels = labels[..., None]
    if labels.shape[1:-1] != logits.shape[1:-1]:
        labels = jax.image.resize(
            labels,
            labels.shape[:1] + logits.shape[1:-1] + labels.shape[-1:],
            method="nearest",
        )
    return labels


def make_train_step(
    model,
    config,
    loss_fn: Optional[Callable] = None,
) -> Callable:
    """Build the jit-ready train step: (state, batch) -> (state, metrics).

    ``batch`` is a dict with 'image' (N,D,H,W,C) and 'label' (N,D,H,W,1).
    Under a sharded batch the loss/grad reductions are global, so gradient
    all-reduce and cross-replica BN come from GSPMD automatically.
    """
    loss_fn = loss_fn or make_loss_fn(
        config.loss,
        n_classes=getattr(config, "n_classes", 1),
        dice_smooth=config.dice_smooth,
        bce_weight=config.bce_weight,
        dice_weight=config.dice_weight,
        tversky_alpha=config.tversky_alpha,
        tversky_beta=config.tversky_beta,
        focal_gamma=config.focal_gamma,
        focal_alpha=config.focal_alpha,
    )
    has_bn = model.norm_layer == "batch"
    accum = max(1, int(getattr(config, "accum_steps", 1)))
    ema_decay = float(getattr(config, "ema_decay", 0.0))
    deep_supervision = bool(getattr(model, "deep_supervision", False))

    def multiscale_loss(outputs, labels, weight):
        """Deep-supervision objective: the loss at every decoder scale,
        geometrically weighted fine -> coarse (nnU-Net's scheme), labels
        nearest-downsampled per scale by align_labels. ``outputs`` is
        (full_res, aux_1/2, aux_1/4, aux_1/8)."""
        total = 0.0
        for w, out in zip(DS_WEIGHTS, outputs):
            total = total + w * loss_fn(out, align_labels(out, labels), weight)
        return total

    def loss_of(params, batch_stats, images, labels, weight):
        variables = {"params": params}
        if has_bn:
            variables["batch_stats"] = batch_stats
            out, mut = model.apply(
                variables, images, train=True, mutable=["batch_stats"]
            )
            new_stats = mut["batch_stats"]
        else:
            out = model.apply(variables, images, train=True)
            new_stats = batch_stats
        if deep_supervision:
            logits, aux = out
            loss = multiscale_loss((logits, *aux), labels, weight)
        else:
            loss = loss_fn(out, align_labels(out, labels), weight)
        return loss, new_stats

    grad_fn = jax.value_and_grad(loss_of, has_aux=True)

    def train_step(state: TrainState, batch):
        images = batch["image"]
        labels = align_labels(
            jnp.zeros(images.shape[:-1] + (1,), images.dtype), batch["label"]
        )
        # optional (N,) 0/1 weights masking tail-batch padding out of the
        # loss (the padded samples are cycled real data, so BN statistics
        # stay on-distribution)
        weight = batch.get("weight")

        if accum == 1:
            (loss, new_stats), grads = grad_fn(
                state.params, state.batch_stats, images, labels, weight
            )
        else:
            # gradient accumulation: lax.scan over microbatches — one
            # microbatch's activations live at a time; grads averaged
            # before the single optimizer update. Note Dice is a global
            # (nonlinear) reduction, so the accumulated loss is the mean
            # of per-microbatch losses (same semantics as torch grad
            # accumulation), not the joint full-batch Dice.
            if images.shape[0] % accum:
                raise ValueError(
                    f"batch size {images.shape[0]} not divisible by "
                    f"accum_steps={accum}"
                )
            micro = images.shape[0] // accum
            img_m = images.reshape(accum, micro, *images.shape[1:])
            lab_m = labels.reshape(accum, micro, *labels.shape[1:])
            w_m = (
                weight.reshape(accum, micro)
                if weight is not None
                else jnp.ones((accum, micro), jnp.float32)
            )

            def body(carry, xs):
                stats, grad_acc, loss_acc = carry
                img, lab, w = xs
                (l, new_stats), g = grad_fn(state.params, stats, img, lab, w)
                grad_acc = jax.tree.map(jnp.add, grad_acc, g)
                return (new_stats, grad_acc, loss_acc + l), None

            zero_grads = jax.tree.map(jnp.zeros_like, state.params)
            (new_stats, grads, loss_sum), _ = jax.lax.scan(
                body, (state.batch_stats, zero_grads, 0.0), (img_m, lab_m, w_m)
            )
            grads = jax.tree.map(lambda g: g / accum, grads)
            loss = loss_sum / accum

        new_state = state.apply_gradients(grads=grads, batch_stats=new_stats)
        if ema_decay > 0:
            # Polyak average, fused into the step (one elementwise pass
            # over the param tree). tf.train.ExponentialMovingAverage-style
            # warmup: early steps average faster so the EMA isn't anchored
            # to the random init for its first 1/(1-decay) steps.
            t = new_state.step.astype(jnp.float32)
            d = jnp.minimum(ema_decay, (1.0 + t) / (10.0 + t))
            new_state = new_state.replace(
                ema_params=jax.tree.map(
                    lambda e, p: d * e + (1.0 - d) * p,
                    state.ema_params,
                    new_state.params,
                )
            )
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
        }
        return new_state, metrics

    return train_step


def make_eval_step(
    model,
    config,
    loss_fn: Optional[Callable] = None,
    return_pred: bool = False,
) -> Callable:
    """Build the eval step: (state, batch) -> metrics dict.

    Returns the batch loss plus *per-sample* Dice/IoU at the configured
    threshold (reference validate_model.py:216-248 computes these per case).
    With ``return_pred`` the thresholded masks ride along as uint8 (4x
    smaller D2H than probabilities) for host-side boundary metrics
    (ops/surface.py).
    """
    n_classes = int(getattr(config, "n_classes", 1))
    loss_fn = loss_fn or make_loss_fn(
        config.loss,
        n_classes=n_classes,
        dice_smooth=config.dice_smooth,
        bce_weight=config.bce_weight,
        dice_weight=config.dice_weight,
        tversky_alpha=config.tversky_alpha,
        tversky_beta=config.tversky_beta,
        focal_gamma=config.focal_gamma,
        focal_alpha=config.focal_alpha,
    )
    has_bn = model.norm_layer == "batch"
    threshold = config.threshold
    # when EMA is on (and ema_eval not opted out), validation scores the
    # averaged weights — they are what 'best' selection and serving use
    use_ema = (
        float(getattr(config, "ema_decay", 0.0)) > 0
        and bool(getattr(config, "ema_eval", True))
    )

    def eval_step(state: TrainState, batch):
        images = batch["image"]
        labels = batch["label"]
        weight = batch.get("weight")
        params = state.ema_params if use_ema else state.params
        variables = {"params": params}
        if has_bn:
            variables["batch_stats"] = state.batch_stats
        logits = state.apply_fn(variables, images, train=False)
        if n_classes >= 2:
            # integer label maps: nearest-resize the (N,...,1) map to the
            # logits' spatial shape, never one-hot on the host
            lab1 = labels if labels.ndim == logits.ndim else labels[..., None]
            lab1 = align_labels(logits[..., :1], lab1)
            loss = loss_fn(logits, lab1, weight)
            # argmax label map; per-sample Dice/IoU per FOREGROUND class
            # (1..K-1), reported as the per-sample mean over them — the
            # multi-class generalization of the reference's binary Dice
            pred_lab = jnp.argmax(logits.astype(jnp.float32), axis=-1)
            n = pred_lab.shape[0]
            lab_flat = lab1[..., 0].reshape(n, -1).astype(jnp.int32)
            pred_flat = pred_lab.reshape(n, -1).astype(jnp.int32)
            dices, ious = [], []
            for c in range(1, n_classes):
                p = (pred_flat == c).astype(jnp.float32)
                t = (lab_flat == c).astype(jnp.float32)
                inter = jnp.sum(p * t, axis=1)
                psum, tsum = jnp.sum(p, axis=1), jnp.sum(t, axis=1)
                dices.append((2.0 * inter) / (psum + tsum + EPS))
                ious.append(inter / (psum + tsum - inter + EPS))
            dice_c = jnp.stack(dices, axis=1)  # (N, K-1)
            iou_c = jnp.stack(ious, axis=1)
            dice = jnp.mean(dice_c, axis=1)
            iou = jnp.mean(iou_c, axis=1)
            w = (
                weight.astype(jnp.float32)
                if weight is not None
                else jnp.ones((n,))
            )
            out = {
                "loss": loss,
                "dice": dice,
                "iou": iou,
                "dice_class": dice_c,
                "iou_class": iou_c,
                "dice_sum": jnp.sum(dice * w),
                "iou_sum": jnp.sum(iou * w),
                "weight_sum": jnp.sum(w),
            }
            if return_pred:
                out["pred"] = pred_lab.astype(jnp.uint8)[..., None]
            return out
        labels = align_labels(logits, labels)
        loss = loss_fn(logits, labels, weight)

        probs = jax.nn.sigmoid(logits.astype(jnp.float32))
        pred = (probs > threshold).astype(jnp.float32)
        n = pred.shape[0]
        p = pred.reshape(n, -1)
        t = labels.reshape(n, -1).astype(jnp.float32)
        inter = jnp.sum(p * t, axis=1)
        psum, tsum = jnp.sum(p, axis=1), jnp.sum(t, axis=1)
        dice = (2.0 * inter) / (psum + tsum + EPS)
        iou = inter / (psum + tsum - inter + EPS)
        # weighted scalar aggregates: replicated outputs every process can
        # read under multi-host sharding (per-sample arrays are not)
        w = weight.astype(jnp.float32) if weight is not None else jnp.ones((n,))
        out = {
            "loss": loss,
            "dice": dice,
            "iou": iou,
            "dice_sum": jnp.sum(dice * w),
            "iou_sum": jnp.sum(iou * w),
            "weight_sum": jnp.sum(w),
        }
        if return_pred:
            out["pred"] = pred.astype(jnp.uint8)
        return out

    return eval_step


def jit_train_step(train_step, donate: bool = True):
    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def jit_eval_step(eval_step):
    return jax.jit(eval_step)
