"""Native C++ resampler: parity with the numpy reference implementation."""

import numpy as np
import pytest

import pcmseg_tpu.data.native as native_mod
from pcmseg_tpu.data.native import get_native_lib, native_resample
from pcmseg_tpu.data.resample import resample_array


@pytest.fixture(scope="module")
def lib():
    lib = get_native_lib(build_if_missing=True)
    if lib is None:
        pytest.skip("native toolchain unavailable; numpy fallback covers this")
    return lib


def _numpy_resample(x, shape, mode):
    """Run the pure-numpy path by disabling the native hook."""
    saved, saved_tried = native_mod._LIB, native_mod._TRIED
    native_mod._LIB, native_mod._TRIED = None, True
    try:
        return resample_array(x, shape, mode)
    finally:
        native_mod._LIB, native_mod._TRIED = saved, saved_tried


@pytest.mark.parametrize("mode", ["linear", "nearest"])
@pytest.mark.parametrize(
    "in_shape,out_shape",
    [((37, 41, 29), (16, 20, 24)), ((8, 8, 8), (17, 13, 9)), ((5, 5, 5), (5, 5, 6))],
)
def test_native_matches_numpy(lib, rng, mode, in_shape, out_shape):
    x = rng.random(in_shape).astype(np.float32) * 100
    a = native_resample(x, out_shape, mode)
    b = _numpy_resample(x, out_shape, mode)
    np.testing.assert_allclose(a, b, atol=1e-4)


def test_native_nearest_label_dtype_roundtrip(lib, rng):
    labels = (rng.random((9, 9, 9)) > 0.5).astype(np.int16) * 7
    out = resample_array(labels, (5, 6, 7), mode="nearest")
    assert out.dtype == labels.dtype
    assert set(np.unique(out)) <= {0, 7}


def test_fallback_when_lib_missing(rng):
    saved, saved_tried = native_mod._LIB, native_mod._TRIED
    native_mod._LIB, native_mod._TRIED = None, True
    try:
        assert native_resample(np.zeros((4, 4, 4), np.float32), (2, 2, 2)) is None
        out = resample_array(rng.random((8, 8, 8)).astype(np.float32), (4, 4, 4))
        assert out.shape == (4, 4, 4)
    finally:
        native_mod._LIB, native_mod._TRIED = saved, saved_tried
