"""Pallas fused conv3d: numerics parity with lax.conv (interpret on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from pcmseg_tpu.models import UNet3D
from pcmseg_tpu.ops.pallas.conv3d import conv3x3x3, conv3x3x3_reference


@pytest.fixture(autouse=True)
def interpret_mode():
    if jax.default_backend() != "tpu":
        with pltpu.force_tpu_interpret_mode():
            yield
    else:
        yield


def _pair(rng, shape, ci, co):
    x = jnp.asarray(rng.normal(size=shape + (ci,)).astype(np.float32))
    w = jnp.asarray((rng.normal(size=(3, 3, 3, ci, co)) * 0.1).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(co,)).astype(np.float32))
    return x, w, b


@pytest.mark.parametrize("relu", [True, False])
def test_small_whole_slice(rng, relu):
    x, w, b = _pair(rng, (2, 4, 8, 8), 8, 16)
    got = conv3x3x3(x, w, b, relu=relu, interpret=True)
    want = conv3x3x3_reference(x, w, b, relu=relu)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_chunked_path_matches(rng):
    # big slice (f32 at 64x128: (66)(130)(64)*4 bytes > limit) → H chunking
    x, w, b = _pair(rng, (1, 3, 64, 128), 64, 8)
    got = conv3x3x3(x, w, b, interpret=True, chunk_large=True)
    want = conv3x3x3_reference(x, w, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-3)


def test_large_slice_falls_back_to_xla(rng):
    x, w, b = _pair(rng, (1, 3, 64, 128), 64, 8)
    got = conv3x3x3(x, w, b, interpret=True)  # default: XLA fallback
    want = conv3x3x3_reference(x, w, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-3)


def test_huge_weights_fall_back_to_xla(rng):
    x, w, b = _pair(rng, (1, 4, 8, 8), 1024, 512)
    got = conv3x3x3(x, w, b, interpret=True)
    want = conv3x3x3_reference(x, w, b)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-2, rtol=1e-3
    )


def test_no_bias(rng):
    x, w, _ = _pair(rng, (1, 4, 8, 8), 8, 8)
    got = conv3x3x3(x, w, None, relu=False, interpret=True)
    want = conv3x3x3_reference(x, w, None, relu=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_kernel_shape_validation(rng):
    x, w, b = _pair(rng, (1, 4, 8, 8), 8, 8)
    with pytest.raises(ValueError):
        conv3x3x3(x, jnp.zeros((3, 3, 3, 4, 8)), b, interpret=True)


def test_unet_pallas_variant_matches_plain(rng):
    """UNet3D(norm='none', use_pallas) == plain norm='none' model."""
    kw = dict(
        base_features=8, norm_layer="none", remat=False, dtype=jnp.float32
    )
    plain = UNet3D(**kw)
    pallas = UNet3D(use_pallas=True, **kw)
    v = plain.init_variables(jax.random.key(0))
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 16, 5)).astype(np.float32))
    out_plain = plain.apply(v, x, train=False)
    out_pallas = pallas.apply(v, x, train=False)  # same param tree
    np.testing.assert_allclose(
        np.asarray(out_pallas), np.asarray(out_plain), atol=2e-3, rtol=1e-2
    )
