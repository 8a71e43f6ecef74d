"""Native fused normalize (native/normalize.cpp) vs the numpy reference.

The C++ path must be value-identical (not merely close) to
resample.normalize_intensity's numpy arithmetic on well-conditioned data,
for every supported input dtype, both output dtypes, and the strided
channel-stack layout load_multimodal_images uses.
"""

import numpy as np
import pytest

import pcmseg_tpu.data.native as native_mod
from pcmseg_tpu.data.native import get_native_lib, native_normalize_into
from pcmseg_tpu.data.resample import normalize_intensity

ml_dtypes = pytest.importorskip("ml_dtypes")

needs_lib = pytest.mark.skipif(
    get_native_lib() is None, reason="native library unavailable"
)


def _numpy_reference(x, mode, percentiles=(1.0, 99.0)):
    d = np.asarray(x, dtype=np.float32)
    if mode == "minmax":
        lo, hi = float(d.min()), float(d.max())
    else:
        lo, hi = (float(v) for v in np.percentile(d, percentiles))
        d = np.clip(d, lo, hi)
    denom = hi - lo
    if denom <= 0:
        return np.zeros_like(d)
    return (d - lo) / denom


@needs_lib
@pytest.mark.parametrize("dtype", [np.float32, np.int16, np.uint16, np.float64])
@pytest.mark.parametrize("mode", ["percentile", "minmax"])
def test_native_matches_numpy(dtype, mode):
    rng = np.random.default_rng(3)
    x = rng.normal(120.0, 60.0, (19, 23, 17))
    if np.issubdtype(dtype, np.integer):
        x = np.clip(x, 0, 500)
    x = x.astype(dtype)
    p = (1.0, 99.0) if mode == "percentile" else (0.0, 100.0)
    out = np.empty(x.shape, np.float32)
    assert native_normalize_into(x, *p, out)
    np.testing.assert_array_equal(out, _numpy_reference(x, mode))


@needs_lib
def test_normalize_intensity_uses_native_path():
    """normalize_intensity itself must go through the fused kernel and
    agree with the pure-numpy arithmetic."""
    rng = np.random.default_rng(4)
    x = rng.normal(0, 50, (21, 22, 23)).astype(np.float32)
    np.testing.assert_array_equal(
        normalize_intensity(x, "percentile", (1.0, 99.0)),
        _numpy_reference(x, "percentile"),
    )
    np.testing.assert_array_equal(
        normalize_intensity(x, "minmax"), _numpy_reference(x, "minmax")
    )


@needs_lib
def test_strided_bf16_stack():
    """Writing channel i of a (D,H,W,C) bf16 stack equals normalize→cast."""
    rng = np.random.default_rng(5)
    c = 5
    stack = np.full((11, 12, 13, c), -1.0, ml_dtypes.bfloat16)
    xs = [rng.normal(0, 30, (11, 12, 13)).astype(np.float32) for _ in range(c)]
    for i, x in enumerate(xs):
        assert native_normalize_into(x, 1.0, 99.0, stack, offset=i, stride=c)
    for i, x in enumerate(xs):
        ref = _numpy_reference(x, "percentile").astype(ml_dtypes.bfloat16)
        assert (np.asarray(stack[..., i]) == ref).all()


@needs_lib
def test_constant_input_writes_zeros():
    x = np.full((8, 9, 10), 3.25, np.float32)
    out = np.ones(x.shape, np.float32)
    assert native_normalize_into(x, 1.0, 99.0, out)
    assert (out == 0).all()


@needs_lib
def test_bounds_rejected():
    x = np.zeros((4, 4, 4), np.float32)
    out = np.empty(x.size, np.float32)
    assert not native_normalize_into(x, 1.0, 99.0, out, offset=1, stride=1)
    assert not native_normalize_into(x, 1.0, 99.0, out[: x.size - 1])
    # non-contiguous destination
    big = np.empty((4, 4, 8), np.float32)
    assert not native_normalize_into(x, 1.0, 99.0, big[:, :, ::2])


def test_numpy_fallback_when_native_disabled(monkeypatch):
    """normalize_intensity must produce the same result with no native lib."""
    rng = np.random.default_rng(6)
    x = rng.normal(10, 5, (9, 8, 7)).astype(np.float32)
    want = normalize_intensity(x, "percentile")
    monkeypatch.setattr(native_mod, "native_normalize_into", lambda *a, **k: False)
    # resample.py imports the symbol at call time from the module
    got = normalize_intensity(x, "percentile")
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


@needs_lib
def test_load_multimodal_images_bf16_matches_f32(tmp_path):
    """The bf16 wire stack equals the float32 stack cast to bf16."""
    import os

    from pcmseg_tpu.core.config import DEFAULT_MODALITIES
    from pcmseg_tpu.data.synthetic import make_synthetic_dataset
    from pcmseg_tpu.infer.predict import load_multimodal_images

    root = str(tmp_path)
    make_synthetic_dataset(root, n_cases=1, shape=(12, 13, 14), seed=0)
    case_dir = os.path.join(root, "staged")
    for m in DEFAULT_MODALITIES:
        os.makedirs(os.path.join(case_dir, m))
        os.link(
            os.path.join(root, "BPH-PCA", "BPH", m, "case000.nii.gz"),
            os.path.join(case_dir, m, "image.nii.gz"),
        )
    f32, _ = load_multimodal_images(case_dir)
    bf16, _ = load_multimodal_images(case_dir, out_dtype=ml_dtypes.bfloat16)
    assert f32.dtype == np.float32 and bf16.dtype == ml_dtypes.bfloat16
    assert (np.asarray(bf16) == f32.astype(ml_dtypes.bfloat16)).all()


def test_load_multimodal_images_threaded_deterministic(tmp_path):
    """decode_threads must not change the result (disjoint strided slots)."""
    import os

    from pcmseg_tpu.core.config import DEFAULT_MODALITIES
    from pcmseg_tpu.data.synthetic import make_synthetic_dataset
    from pcmseg_tpu.infer.predict import load_multimodal_images

    root = str(tmp_path)
    make_synthetic_dataset(root, n_cases=1, shape=(10, 11, 12), seed=1)
    case_dir = os.path.join(root, "staged")
    for m in DEFAULT_MODALITIES[:-1]:  # one modality missing -> zero_fill
        os.makedirs(os.path.join(case_dir, m))
        os.link(
            os.path.join(root, "BPH-PCA", "BPH", m, "case000.nii.gz"),
            os.path.join(case_dir, m, "image.nii.gz"),
        )
    os.makedirs(os.path.join(case_dir, DEFAULT_MODALITIES[-1]))
    seq, _ = load_multimodal_images(case_dir, decode_threads=1)
    par, _ = load_multimodal_images(case_dir, decode_threads=5)
    np.testing.assert_array_equal(seq, par)
    assert (seq[..., -1] == 0).all()
