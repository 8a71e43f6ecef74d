"""im2col conv lowering (ops/im2col.py): numerics vs lax conv, custom-VJP
gradient correctness, module/checkpoint interchangeability, lowering rule."""

import pytest

# compile-heavy on a 1-core host (measured; see pyproject's marker
# registration) - excluded from the quick lane `pytest -m 'not slow'`
pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcmseg_tpu.ops.im2col import (
    _fold,
    _im2col,
    conv3x3_im2col,
    should_use_im2col,
)


def _lax_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), ((1, 1), (1, 1), (1, 1)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


@pytest.mark.parametrize("shape", [(1, 6, 6, 6, 4), (2, 5, 7, 6, 3)])
def test_forward_matches_lax_conv(shape):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, shape[-1], 5)), jnp.float32)
    np.testing.assert_allclose(
        conv3x3_im2col(x, w), _lax_conv(x, w), rtol=1e-5, atol=1e-5
    )


def test_fold_is_adjoint_of_im2col():
    """<im2col(x), c> == <x, fold(c)> — the VJP's col2im must be exact."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 4, 5, 6, 3)), jnp.float32)
    c = jnp.asarray(rng.normal(size=(1, 4, 5, 6, 81)), jnp.float32)
    lhs = jnp.vdot(_im2col(x), c)
    rhs = jnp.vdot(x, _fold(c, x.shape))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-4)


def test_custom_vjp_matches_lax_grads():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 5, 5, 5, 4)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 4, 6)) * 0.1, jnp.float32)
    cot = jnp.asarray(rng.normal(size=(1, 5, 5, 5, 6)), jnp.float32)

    def loss_ours(x, w):
        return jnp.vdot(conv3x3_im2col(x, w), cot)

    def loss_lax(x, w):
        return jnp.vdot(_lax_conv(x, w), cot)

    gx_a, gw_a = jax.grad(loss_ours, argnums=(0, 1))(x, w)
    gx_b, gw_b = jax.grad(loss_lax, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(gx_a, gx_b, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(gw_a, gw_b, rtol=1e-4, atol=1e-4)


def test_module_interchangeable_with_nn_conv():
    """Same RNG → identical init; each other's params → identical outputs."""
    from flax import linen as nn

    from pcmseg_tpu.models.unet3d import Im2colConv3x3, kaiming_fan_out

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, 6, 6, 6, 8)), jnp.float32)
    m_i2c = Im2colConv3x3(12, dtype=jnp.float32)
    m_lax = nn.Conv(
        12, kernel_size=(3, 3, 3), padding=1, kernel_init=kaiming_fan_out,
        dtype=jnp.float32, name=None,
    )
    v_i2c = m_i2c.init(jax.random.key(7), x)
    v_lax = m_lax.init(jax.random.key(7), x)
    # identical param trees from the same seed
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(a, b), v_i2c, v_lax
    )
    # cross-loading params gives matching outputs
    np.testing.assert_allclose(
        m_i2c.apply(v_lax, x), m_lax.apply(v_i2c, x), rtol=1e-5, atol=1e-5
    )


def test_lowering_rule():
    # bottleneck convs: measured end-to-end win (BENCH.md round-2)
    assert should_use_im2col((8, 8, 8), 1024, 1024)
    assert should_use_im2col((8, 8, 8), 512, 1024)
    # thin-input convs (the 5-modality inc conv): measured 4.6% step win
    # at 128^3/base-64 (BENCH.md round-3, ab_train_step auto vs i2cinc)
    assert should_use_im2col((128, 128, 128), 5, 64)
    assert should_use_im2col((8, 8, 8), 4, 8)
    # out of scope: end-to-end neutral-to-slower, or col buffer unaffordable
    assert not should_use_im2col((16, 16, 16), 512, 512)
    assert not should_use_im2col((64, 64, 64), 128, 128)
    assert not should_use_im2col((128, 128, 128), 64, 64)


def test_model_outputs_match_across_lowerings():
    """Full U-Net: forced im2col vs forced lax — same params, same output
    and same grads (the lowering must be semantics-free)."""
    from pcmseg_tpu.models import UNet3D

    kw = dict(
        n_modalities=2, n_classes=1, base_features=4, norm_layer="group",
        dtype=jnp.float32, param_dtype=jnp.float32, remat=False,
    )
    m_lax = UNet3D(conv_lowering="lax", **kw)
    m_i2c = UNet3D(conv_lowering="im2col", **kw)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 16, 2)), jnp.float32)
    v = m_lax.init(jax.random.key(0), x, train=True)
    # identical init across lowerings (same param names/shapes/seed)
    v2 = m_i2c.init(jax.random.key(0), x, train=True)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b), v, v2)

    y_lax = m_lax.apply(v, x, train=True, mutable=["batch_stats"])[0]
    y_i2c = m_i2c.apply(v, x, train=True, mutable=["batch_stats"])[0]
    np.testing.assert_allclose(y_lax, y_i2c, rtol=1e-4, atol=1e-4)

    def loss(model, params):
        vv = {**v, "params": params}
        out, _ = model.apply(vv, x, train=True, mutable=["batch_stats"])
        return jnp.mean(out**2)

    g_lax = jax.grad(lambda p: loss(m_lax, p))(v["params"])
    g_i2c = jax.grad(lambda p: loss(m_i2c, p))(v["params"])
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-4),
        g_lax,
        g_i2c,
    )


@pytest.mark.parametrize(
    "shape,chunk",
    [((1, 8, 6, 6, 4), 4), ((2, 9, 5, 7, 3), 4), ((1, 6, 6, 6, 4), 16)],
)
def test_chunked_forward_matches_lax(shape, chunk):
    """Depth-chunked im2col — incl. uneven tail slab and chunk > D."""
    from pcmseg_tpu.ops.im2col import conv3x3_im2col_chunked

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=shape), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, shape[-1], 5)), jnp.float32)
    np.testing.assert_allclose(
        conv3x3_im2col_chunked(x, w, chunk), _lax_conv(x, w),
        rtol=1e-5, atol=1e-5,
    )


def test_chunked_custom_vjp_matches_lax_grads():
    from pcmseg_tpu.ops.im2col import conv3x3_im2col_chunked

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(1, 9, 5, 5, 4)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 4, 6)) * 0.1, jnp.float32)
    cot = jnp.asarray(rng.normal(size=(1, 9, 5, 5, 6)), jnp.float32)

    def loss_ours(x, w):
        return jnp.vdot(conv3x3_im2col_chunked(x, w, 4), cot)

    def loss_lax(x, w):
        return jnp.vdot(_lax_conv(x, w), cot)

    gx_a, gw_a = jax.grad(loss_ours, argnums=(0, 1))(x, w)
    gx_b, gw_b = jax.grad(loss_lax, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(gx_a, gx_b, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(gw_a, gw_b, rtol=1e-4, atol=1e-4)


def test_matmul_dispatcher_switches_to_chunked(monkeypatch):
    """conv3x3_matmul: identical numerics on both sides of the col-buffer
    budget (the dispatcher only changes the transient memory shape)."""
    from pcmseg_tpu.ops import im2col as i2c

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(1, 8, 6, 6, 4)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 4, 5)), jnp.float32)
    y_mono = i2c.conv3x3_matmul(x, w)
    monkeypatch.setattr(i2c, "MONO_COL_BUDGET_BYTES", 0)
    monkeypatch.setattr(i2c, "CHUNK_DEPTH", 4)
    y_chunk = i2c.conv3x3_matmul(x, w)
    np.testing.assert_allclose(y_mono, y_chunk, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(y_mono, _lax_conv(x, w), rtol=1e-5, atol=1e-5)


def test_auto_lowering_only_on_training_path():
    """auto: inference traces must not contain the im2col concat blowup."""
    from pcmseg_tpu.models.unet3d import DoubleConv3D

    m = DoubleConv3D(features=64, norm_layer="group", dtype=jnp.float32,
                     param_dtype=jnp.float32, conv_lowering="auto")
    x = jnp.zeros((1, 8, 8, 8, 128), jnp.float32)
    v = m.init(jax.random.key(0), x, train=True)
    # both modes run and agree (params are interchangeable by construction)
    y_train = m.apply(v, x, train=True)
    y_eval = m.apply(v, x, train=False)
    np.testing.assert_allclose(y_train, y_eval, rtol=1e-4, atol=1e-5)


def test_serving_rule_gates_eval_path(monkeypatch):
    """The eval path is gated by should_use_im2col_serving, separately from
    the training rule — and a flipped serving arm must be semantics-free
    (identical params, matching outputs vs the lax path), including when
    the depth-chunked fallback kicks in."""
    from pcmseg_tpu.models.unet3d import DoubleConv3D
    from pcmseg_tpu.ops import im2col as i2c

    # production default: serving keeps XLA's conv everywhere until an
    # in-graph A/B (tools/ab_serve_forward.py) proves an arm
    assert not i2c.should_use_im2col_serving((128, 128, 128), 64, 64)
    assert not i2c.should_use_im2col_serving((128, 128, 128), 5, 64)

    m = DoubleConv3D(features=6, norm_layer="none", dtype=jnp.float32,
                     param_dtype=jnp.float32, conv_lowering="auto")
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.normal(size=(1, 12, 6, 6, 4)), jnp.float32)
    v = m.init(jax.random.key(0), x, train=False)
    y_lax = m.apply(v, x, train=False)

    monkeypatch.setattr(
        i2c, "should_use_im2col_serving", lambda sp, ci, co: True
    )
    y_i2c = m.apply(v, x, train=False)
    np.testing.assert_allclose(y_lax, y_i2c, rtol=1e-5, atol=1e-5)

    # force the chunked fallback (D=12 > serve slab 8, zero mono budget)
    monkeypatch.setattr(i2c, "MONO_COL_BUDGET_BYTES", 0)
    y_chunked = m.apply(v, x, train=False)
    np.testing.assert_allclose(y_lax, y_chunked, rtol=1e-5, atol=1e-5)
