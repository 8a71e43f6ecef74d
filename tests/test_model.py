"""UNet3D structural tests (small base_features to keep CPU compiles fast)."""

import pytest

# compile-heavy on a 1-core host (measured; see pyproject's marker
# registration) - excluded from the quick lane `pytest -m 'not slow'`
pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcmseg_tpu.core.config import get_config
from pcmseg_tpu.models import UNet3D
from pcmseg_tpu.models.unet3d import param_count


def tiny(**kw):
    kw.setdefault("base_features", 4)
    kw.setdefault("remat", False)
    kw.setdefault("dtype", jnp.float32)
    return UNet3D(**kw)


def test_output_shape_and_dtype():
    m = tiny()
    v = m.init_variables(jax.random.key(0), (2, 16, 16, 16, 5))
    out = m.apply(v, jnp.zeros((2, 16, 16, 16, 5)), train=False)
    assert out.shape == (2, 16, 16, 16, 1)
    assert out.dtype == jnp.float32


def test_n_classes_configurable():
    m = tiny(n_classes=3)
    v = m.init_variables(jax.random.key(0))
    out = m.apply(v, jnp.zeros((1, 16, 16, 16, 5)), train=False)
    assert out.shape[-1] == 3


def test_wrong_channel_count_raises():
    m = tiny()
    v = m.init_variables(jax.random.key(0))
    with pytest.raises(ValueError):
        m.apply(v, jnp.zeros((1, 16, 16, 16, 3)), train=False)


def test_odd_spatial_sizes_pad_align():
    # decoder pad-alignment must reproduce input spatial dims exactly
    m = tiny()
    v = m.init_variables(jax.random.key(0), (1, 17, 19, 21, 5))
    out = m.apply(v, jnp.zeros((1, 17, 19, 21, 5)), train=False)
    assert out.shape == (1, 17, 19, 21, 1)


def test_param_count_matches_reference_scale():
    # full-size model: ~90M params like the reference's base-64 UNet3D
    m = UNet3D(base_features=64, remat=False)
    shapes = jax.eval_shape(
        lambda: m.init({"params": jax.random.key(0)},
                       jnp.zeros((1, 16, 16, 16, 5)), train=False)
    )
    n = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes["params"]))
    assert 88_000_000 < n < 93_000_000


def test_batchnorm_updates_stats_in_train_mode():
    m = tiny()
    v = m.init_variables(jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (2, 16, 16, 16, 5))
    _, mut = m.apply(v, x, train=True, mutable=["batch_stats"])
    before = jax.tree.leaves(v["batch_stats"])
    after = jax.tree.leaves(mut["batch_stats"])
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(before, after)
    )
    assert changed


def test_eval_mode_does_not_need_mutable():
    m = tiny()
    v = m.init_variables(jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (1, 16, 16, 16, 5))
    out1 = m.apply(v, x, train=False)
    out2 = m.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))


def test_predict_and_inference_methods():
    m = tiny()
    v = m.init_variables(jax.random.key(0))
    x = jax.random.normal(jax.random.key(2), (1, 16, 16, 16, 5))
    probs = m.apply(v, x, method=UNet3D.predict)
    assert float(probs.min()) >= 0.0 and float(probs.max()) <= 1.0
    mask = m.apply(v, x, method=UNet3D.inference)
    u = set(np.unique(np.asarray(mask)).tolist())
    assert u <= {0.0, 1.0}


def test_groupnorm_variant():
    m = tiny(norm_layer="group")
    v = m.init_variables(jax.random.key(0))
    assert "batch_stats" not in v
    out = m.apply(v, jnp.zeros((1, 16, 16, 16, 5)), train=True)
    assert out.shape == (1, 16, 16, 16, 1)


def test_remat_matches_no_remat():
    x = jax.random.normal(jax.random.key(3), (1, 16, 16, 16, 5))
    m1 = tiny(remat=False)
    m2 = tiny(remat=True)
    v = m1.init_variables(jax.random.key(0))
    out1 = m1.apply(v, x, train=False)
    out2 = m2.apply(v, x, train=False)  # same param structure
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


def test_from_config():
    c = get_config("quick", base_features=4, remat=False)
    m = UNet3D.from_config(c)
    assert m.n_modalities == 5 and m.n_classes == 1 and m.base_features == 4


def test_matmul_conv_transpose_equals_flax():
    """The MXU-matmul upsampler must match nn.ConvTranspose bit-for-float.

    Same param name/shape ('kernel' (2,2,2,Ci,Co), 'bias'), so checkpoints
    and the torch converter are unchanged; only the lowering differs
    (lax.conv_transpose measured 1-9% MFU on v5e — BENCH.md round 2)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax import linen as nn

    from pcmseg_tpu.models.unet3d import MatmulConvTranspose

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 4, 6, 8, 10)).astype(np.float32))
    ref = nn.ConvTranspose(
        7, kernel_size=(2, 2, 2), strides=(2, 2, 2), padding="VALID",
        dtype=jnp.float32, param_dtype=jnp.float32,
    )
    ours = MatmulConvTranspose(7, dtype=jnp.float32, param_dtype=jnp.float32)
    v = ref.init(jax.random.key(0), x)
    np.testing.assert_allclose(
        np.asarray(ref.apply(v, x)), np.asarray(ours.apply(v, x)), atol=1e-5
    )
