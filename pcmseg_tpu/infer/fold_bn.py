"""Fold frozen BatchNorm statistics into conv weights for inference.

At inference BN is an affine map with frozen statistics:
    y = gamma * (x - mean) / sqrt(var + eps) + beta
For conv → BN, that folds into the conv itself:
    w' = w * (gamma / sqrt(var + eps))        [per output channel]
    b' = (b - mean) * (gamma / sqrt(var+eps)) + beta
removing every BN op from the serving graph — fewer HBM round trips and
fused conv+bias+ReLU kernels from XLA. This is the classic production
inference-graph optimization the reference never had.

The folded params run through the same UNet3D with ``norm_layer='none'``.
Numerics are gated by tests/test_fold_bn.py (exact equality up to fp error).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import numpy as np

BN_EPS = 1e-5


def _fold_one(conv: Dict, norm: Dict, stats: Dict) -> Dict:
    """Fold one norm layer into its preceding conv. Returns new conv dict."""
    scale = np.asarray(norm["scale"], dtype=np.float64)
    bias = np.asarray(norm["bias"], dtype=np.float64)
    mean = np.asarray(stats["mean"], dtype=np.float64)
    var = np.asarray(stats["var"], dtype=np.float64)

    mult = scale / np.sqrt(var + BN_EPS)  # (C_out,)
    kernel = np.asarray(conv["kernel"], dtype=np.float64) * mult  # last axis C_out
    cbias = np.asarray(conv.get("bias", np.zeros_like(mean)), dtype=np.float64)
    new_bias = (cbias - mean) * mult + bias
    return {
        "kernel": kernel.astype(np.asarray(conv["kernel"]).dtype),
        "bias": new_bias.astype(np.asarray(conv["kernel"]).dtype),
    }


def fold_batchnorm(params: Any, batch_stats: Any) -> Any:
    """Return a params tree with every conv{i}+norm{i} pair folded.

    Works on the UNet3D layout: any dict containing both ``conv{i}`` and
    ``norm{i}`` children gets folded; ``norm{i}`` entries are dropped.
    The result is compatible with ``UNet3D(norm_layer='none')``.
    """
    params = jax.device_get(params)
    batch_stats = jax.device_get(batch_stats)

    def walk(p: Any, s: Any) -> Any:
        if not isinstance(p, dict):
            return p
        out = {}
        for key, val in p.items():
            if key.startswith("norm"):
                continue  # consumed by the paired conv below
            if (
                key.startswith("conv")
                and isinstance(val, dict)
                and "kernel" in val
                and ("norm" + key[4:]) in p
            ):
                nkey = "norm" + key[4:]
                out[key] = _fold_one(val, p[nkey], s[nkey])
            else:
                out[key] = walk(val, s.get(key, {}) if isinstance(s, dict) else {})
        return out

    return walk(params, batch_stats)


def folded_inference_model(config) -> "Tuple[Any, Any]":
    """(model, fold_fn): UNet3D(norm_layer='none') + params transformer."""
    import jax.numpy as jnp

    from pcmseg_tpu.models import UNet3D

    model = UNet3D(
        n_modalities=config.n_modalities,
        n_classes=config.n_classes,
        base_features=config.base_features,
        norm_layer="none",
        dtype=jnp.dtype(config.compute_dtype),
        remat=False,
    )
    return model, fold_batchnorm
