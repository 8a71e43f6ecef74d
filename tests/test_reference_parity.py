"""Parity gate against the ACTUAL reference model class.

Round-1 parity evidence compared against a compact torch reimplementation;
this file closes the gap (VERDICT round-1, next-round item #2) by importing
``/root/reference/models/unet3d.py:160-296`` itself and checking:

  (a) our exported state_dict loads with ``strict=True`` — every one of the
      reference's 136 parameter/buffer keys present, named, and shaped right;
  (b) forward logits parity on identical inputs at the reference's real
      width (base 64, 90,311,361 params — the exact count of the reference);
  (c) ``predict`` (sigmoid) parity, covering the reference's inference
      method (models/unet3d.py:298-318).

The reference tree is read-only and torch-only; it is imported, never
copied. Skipped cleanly when the tree is absent (standalone repo checkout).
"""

import os
import sys

import numpy as np
import pytest

REFERENCE_ROOT = "/root/reference"

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE_ROOT, "models")),
    reason="reference tree not available",
)


def _import_reference_unet():
    sys.path.insert(0, REFERENCE_ROOT)
    try:
        from models.unet3d import UNet3D as RefUNet3D
    finally:
        sys.path.remove(REFERENCE_ROOT)
    return RefUNet3D


def test_strict_load_and_forward_parity_vs_reference_class():
    import jax
    import jax.numpy as jnp

    from pcmseg_tpu.core.config import get_config
    from pcmseg_tpu.models import UNet3D
    from pcmseg_tpu.train.checkpoints import params_to_torch_state_dict

    RefUNet3D = _import_reference_unet()

    # the reference hardcodes init_features=64 (models/unet3d.py:190)
    config = get_config(
        "quick",
        base_features=64,
        remat=False,
        compute_dtype="float32",
        target_size=(16, 16, 16),
    )
    model = UNet3D.from_config(config)
    variables = model.init_variables(jax.random.key(0), (1, 16, 16, 16, 5))
    params, stats = variables["params"], variables["batch_stats"]

    n_ours = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    assert n_ours == 90_311_361  # exact reference param count

    ref = RefUNet3D(n_modalities=5, n_classes=1)
    sd = params_to_torch_state_dict(params, stats)
    # (a) strict load: any missing/renamed/misshaped key fails loudly
    ref.load_state_dict(sd, strict=True)
    ref.eval()

    # (b) logits parity on identical inputs
    x = np.random.default_rng(7).normal(size=(1, 16, 16, 16, 5))
    x = x.astype(np.float32)
    ours = np.asarray(
        model.apply(
            {"params": params, "batch_stats": stats},
            jnp.asarray(x),
            train=False,
        )
    )
    with torch.no_grad():
        xt = torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3)))
        theirs_logits = ref(xt)
        theirs_probs = ref.predict(xt)
    theirs = np.transpose(theirs_logits.numpy(), (0, 2, 3, 4, 1))
    # conv accumulation order differs between XLA and torch; O(1) errors
    # are what a layout/mapping bug produces
    np.testing.assert_allclose(ours, theirs, atol=5e-3, rtol=1e-2)

    # (c) predict() parity (reference models/unet3d.py:298-318)
    ours_probs = np.asarray(
        model.apply(
            {"params": params, "batch_stats": stats},
            jnp.asarray(x),
            method=UNet3D.predict,
        )
    )
    theirs_probs = np.transpose(theirs_probs.numpy(), (0, 2, 3, 4, 1))
    np.testing.assert_allclose(ours_probs, theirs_probs, atol=2e-3)


def test_import_reference_weights_forward_parity():
    """Kaiming-initialized REFERENCE weights imported into our model match."""
    import jax
    import jax.numpy as jnp

    from pcmseg_tpu.core.config import get_config
    from pcmseg_tpu.models import UNet3D
    from pcmseg_tpu.train.checkpoints import (
        batch_stats_from_torch_state_dict,
        params_from_torch_state_dict,
    )

    RefUNet3D = _import_reference_unet()
    torch.manual_seed(3)
    ref = RefUNet3D(n_modalities=5, n_classes=1).eval()

    config = get_config(
        "quick",
        base_features=64,
        remat=False,
        compute_dtype="float32",
        target_size=(16, 16, 16),
    )
    model = UNet3D.from_config(config)
    variables = model.init_variables(jax.random.key(0), (1, 16, 16, 16, 5))
    params = params_from_torch_state_dict(ref.state_dict(), variables["params"])
    stats = batch_stats_from_torch_state_dict(
        ref.state_dict(), variables["batch_stats"]
    )

    x = np.random.default_rng(11).normal(size=(1, 16, 16, 16, 5))
    x = x.astype(np.float32)
    ours = np.asarray(
        model.apply(
            {"params": params, "batch_stats": stats}, jnp.asarray(x), train=False
        )
    )
    with torch.no_grad():
        theirs = ref(torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3))))
    theirs = np.transpose(theirs.numpy(), (0, 2, 3, 4, 1))
    np.testing.assert_allclose(ours, theirs, atol=5e-3, rtol=1e-2)
