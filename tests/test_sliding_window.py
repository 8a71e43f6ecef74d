"""Sliding-window tiled inference tests (pure host logic, no model)."""

import numpy as np
import pytest

from pcmseg_tpu.infer.sliding_window import (
    _window_starts,
    grid_shape,
    sliding_window_predict,
)


def test_window_starts_cover_and_right_align():
    assert _window_starts(10, 4, 2) == [0, 2, 4, 6]
    assert _window_starts(11, 4, 2) == [0, 2, 4, 6, 7]  # right-aligned tail
    assert _window_starts(4, 4, 2) == [0]
    assert _window_starts(3, 4, 2) == [0]  # smaller than window


def identity_predictor(mean_only=False):
    def f(x):
        # x: (1, wd, wh, ww, C) → take channel 0 as "probability"
        return x[..., :1]

    return f


def test_identity_blend_reconstructs_volume():
    rng = np.random.default_rng(0)
    img = rng.random((20, 24, 28, 5)).astype(np.float32)
    out = sliding_window_predict(
        identity_predictor(), img, window_size=(8, 8, 8), overlap=0.5
    )
    assert out.shape == (20, 24, 28, 1)
    # identity predictions blend to the original channel 0 exactly
    np.testing.assert_allclose(out[..., 0], img[..., 0], atol=1e-6)


def test_small_volume_padded_then_cropped():
    img = np.ones((5, 6, 7, 2), dtype=np.float32)
    out = sliding_window_predict(
        lambda x: x[..., :1], img, window_size=(8, 8, 8), overlap=0.25
    )
    assert out.shape == (5, 6, 7, 1)
    np.testing.assert_allclose(out[..., 0], 1.0)


def test_call_count_matches_grid():
    calls = []

    def counting(x):
        calls.append(1)
        return x[..., :1]

    img = np.zeros((16, 16, 16, 1), dtype=np.float32)
    sliding_window_predict(counting, img, window_size=(8, 8, 8), overlap=0.5)
    gs = grid_shape((16, 16, 16), (8, 8, 8), 0.5)
    assert gs == (3, 3, 3)
    assert len(calls) == 27


def test_overlap_validation_and_shape_validation():
    with pytest.raises(ValueError):
        sliding_window_predict(lambda x: x, np.zeros((4, 4, 4, 1)), overlap=1.0)
    with pytest.raises(ValueError):
        sliding_window_predict(lambda x: x, np.zeros((4, 4, 4)), overlap=0.5)


def test_zero_overlap_no_double_counting():
    img = np.random.default_rng(1).random((16, 16, 16, 1)).astype(np.float32)
    out = sliding_window_predict(
        lambda x: x[..., :1], img, window_size=(8, 8, 8), overlap=0.0
    )
    np.testing.assert_allclose(out[..., 0], img[..., 0], atol=1e-6)


@pytest.mark.parametrize("tile_batch", [1, 3, 4, 64])
def test_device_sliding_window_matches_host(rng, tile_batch):
    """On-device tiled predictor == host-loop blending (identity model),
    for every tile-batching factor incl. ragged (3) and over-large (64)."""
    from pcmseg_tpu.infer.sliding_window import make_device_sliding_window

    img = rng.random((20, 24, 28, 5)).astype(np.float32)

    def apply_fn(variables, x):  # identity "model": channel 0 as prob
        return x[..., :1]

    run = make_device_sliding_window(
        apply_fn, img.shape[:3], n_channels=5, n_out=1,
        window_size=(8, 8, 8), overlap=0.5, tile_batch=tile_batch,
    )
    got = np.asarray(run({}, img))
    want = sliding_window_predict(
        lambda x: x[..., :1], img, window_size=(8, 8, 8), overlap=0.5
    )
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_device_sliding_window_small_volume(rng):
    from pcmseg_tpu.infer.sliding_window import make_device_sliding_window

    img = rng.random((5, 6, 7, 2)).astype(np.float32)
    run = make_device_sliding_window(
        lambda v, x: x[..., :1], img.shape[:3], 2, 1,
        window_size=(8, 8, 8), overlap=0.25,
    )
    out = np.asarray(run({}, img))
    assert out.shape == (5, 6, 7, 1)
    np.testing.assert_allclose(out[..., 0], img[..., 0], atol=1e-6)


def test_gaussian_blend_reduces_seam_error():
    """Tile predictions degraded near borders: gaussian blending must beat
    uniform averaging (VERDICT round-1 polish item — seam regression)."""
    import numpy as np

    from pcmseg_tpu.infer.sliding_window import sliding_window_predict

    rng = np.random.default_rng(0)
    gt = rng.random((24, 24, 24, 1)).astype(np.float32)
    ws = (16, 16, 16)
    # artifact grows linearly toward tile borders (receptive-field falloff)
    n = ws[0]
    d = np.abs(np.arange(n, dtype=np.float32) - (n - 1) / 2) / (n / 2)
    dist = np.maximum.reduce(np.meshgrid(d, d, d, indexing="ij"))
    border_err = (0.5 * dist[..., None]).astype(np.float32)

    def pf(tile):  # identity prediction + border-heavy artifact
        return tile[..., :1] + border_err[None]

    kw = dict(window_size=ws, overlap=0.5)
    out_g = sliding_window_predict(pf, gt, blend="gaussian", **kw)
    out_u = sliding_window_predict(pf, gt, blend="uniform", **kw)
    # compare inside the seam band, where tiles overlap (2 tiles/axis at
    # starts 0 and 8 → the [8:16) band is multi-coverage); single-coverage
    # corners are identical under any weighting
    band = np.s_[8:16, 8:16, 8:16]
    err_g = np.abs(out_g[band] - gt[band]).mean()
    err_u = np.abs(out_u[band] - gt[band]).mean()
    assert err_g < 0.8 * err_u, (err_g, err_u)


def test_device_gaussian_matches_host(rng):
    """On-device gaussian blending == host-loop gaussian blending."""
    import jax.numpy as jnp
    import numpy as np

    from pcmseg_tpu.infer.sliding_window import (
        make_device_sliding_window,
        sliding_window_predict,
    )

    img = rng.random((20, 20, 20, 2)).astype(np.float32)

    def apply_fn(variables, x):
        return x[..., :1] * variables["scale"]

    run = make_device_sliding_window(
        apply_fn, (20, 20, 20), n_channels=2, n_out=1,
        window_size=(16, 16, 16), overlap=0.5, blend="gaussian",
    )
    got = np.asarray(run({"scale": jnp.asarray(0.7)}, jnp.asarray(img)))
    want = sliding_window_predict(
        lambda t: t[..., :1] * 0.7, img,
        window_size=(16, 16, 16), overlap=0.5, blend="gaussian",
    )
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_device_sliding_window_sharded_over_mesh(rng):
    """Tiles sharded over an 8-device 'data' mesh == host-loop blending.

    Sliding-window serving scales across chips with no collectives beyond
    the output gather: each device runs the full net on its tile shard.
    """
    import jax

    from pcmseg_tpu.infer.sliding_window import make_device_sliding_window
    from pcmseg_tpu.parallel.sharding import make_mesh

    mesh = make_mesh(data_parallel=8)
    img = rng.random((20, 24, 28, 5)).astype(np.float32)

    run = make_device_sliding_window(
        lambda v, x: x[..., :1], img.shape[:3], 5, 1,
        window_size=(8, 8, 8), overlap=0.5, tile_batch=3, mesh=mesh,
    )
    got = np.asarray(run({}, img))
    want = sliding_window_predict(
        lambda x: x[..., :1], img, window_size=(8, 8, 8), overlap=0.5
    )
    np.testing.assert_allclose(got, want, atol=1e-6)
