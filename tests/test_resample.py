"""Resampling semantics tests (SITK-equivalent index mapping)."""

import numpy as np
import pytest

from pcmseg_tpu.data import Volume
from pcmseg_tpu.data.resample import normalize_intensity, resample, resample_array


def test_identity_when_shapes_match(rng):
    x = rng.random((8, 8, 8)).astype(np.float32)
    out = resample_array(x, (8, 8, 8))
    np.testing.assert_array_equal(out, x)


def test_downsample_by_2_exact_mapping():
    # i = j * in/out = 2j → picks even indices exactly, no interpolation
    x = np.arange(8 * 8 * 8, dtype=np.float32).reshape(8, 8, 8)
    out = resample_array(x, (4, 4, 4), mode="linear")
    np.testing.assert_allclose(out, x[::2, ::2, ::2])


def test_linear_interpolation_values():
    # 1D-like ramp along z: upsampling 4→8 samples at i = j*0.5
    x = np.zeros((4, 1, 1), dtype=np.float32)
    x[:, 0, 0] = [0.0, 2.0, 4.0, 6.0]
    out = resample_array(x, (8, 1, 1), mode="linear")
    # j=0..7 → i=0,0.5,...,3.5 → values 0,1,2,3,4,5,6, then i=3.5 out of
    # buffer? no: 3.5 > 3 = size-1 → SITK default 0
    np.testing.assert_allclose(out[:, 0, 0], [0, 1, 2, 3, 4, 5, 6, 0])


def test_nearest_mode_preserves_label_values():
    rng = np.random.default_rng(0)
    x = (rng.random((9, 9, 9)) > 0.5).astype(np.int16) * 3
    out = resample_array(x, (5, 5, 5), mode="nearest")
    assert set(np.unique(out)) <= {0, 3}
    assert out.dtype == x.dtype


def test_nearest_round_half_up():
    x = np.zeros((4, 1, 1), dtype=np.float32)
    x[:, 0, 0] = [10, 20, 30, 40]
    # out 8: i = 0,0.5,1,1.5,2,2.5,3,3.5 → round-half-up: 0,1,1,2,2,3,3,4(out→0)
    out = resample_array(x, (8, 1, 1), mode="nearest")
    np.testing.assert_allclose(out[:, 0, 0], [10, 20, 20, 30, 30, 40, 40, 0])


def test_volume_resample_updates_spacing(rng):
    v = Volume(
        rng.random((16, 8, 8)).astype(np.float32),
        spacing=(1.0, 2.0, 3.0),
        origin=(5.0, 6.0, 7.0),
    )
    out = resample(v, (8, 8, 16))
    # spacing order is (x,y,z); array axes are (z,y,x)
    # x: 8→16 → 0.5x, y: 8→8 → same, z: 16→8 → 2x
    np.testing.assert_allclose(out.spacing, (0.5, 2.0, 6.0))
    assert out.origin == v.origin
    assert out.shape == (8, 8, 16)


def test_resample_rejects_non3d():
    with pytest.raises(ValueError):
        resample_array(np.zeros((4, 4)), (2, 2, 2))
    with pytest.raises(ValueError):
        resample_array(np.zeros((4, 4, 4)), (2, 2, 2), mode="cubic")


def test_normalize_percentile():
    x = np.concatenate([np.full(98, 50.0), [0.0], [1000.0]]).astype(np.float32)
    out = normalize_intensity(x, "percentile", (1.0, 99.0))
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_normalize_minmax_and_zscore_and_none(rng):
    x = rng.normal(10, 5, size=(4, 4, 4)).astype(np.float32)
    mm = normalize_intensity(x, "minmax")
    assert mm.min() == pytest.approx(0.0) and mm.max() == pytest.approx(1.0)
    zs = normalize_intensity(x, "zscore")
    assert abs(zs.mean()) < 1e-5 and zs.std() == pytest.approx(1.0, rel=1e-4)
    np.testing.assert_array_equal(normalize_intensity(x, "none"), x)
    with pytest.raises(ValueError):
        normalize_intensity(x, "bogus")


def test_normalize_constant_input_is_safe():
    x = np.full((3, 3, 3), 7.0, dtype=np.float32)
    assert normalize_intensity(x, "minmax").max() == 0.0
    assert normalize_intensity(x, "percentile").max() == 0.0
    assert np.isfinite(normalize_intensity(x, "zscore")).all()
