"""NIfTI / MetaImage I/O round-trip and format tests."""

import gzip
import struct

import numpy as np
import pytest

from pcmseg_tpu.data import (
    Volume,
    read_mha,
    read_nifti,
    read_volume,
    write_mha,
    write_nifti,
    write_volume,
)
from pcmseg_tpu.data.io import read_header, strip_ext
from pcmseg_tpu.data.nifti import read_nifti_header


def make_vol(rng, shape=(7, 9, 11), dtype=np.float32):
    data = (rng.random(shape) * 100).astype(dtype)
    return Volume(
        data,
        spacing=(0.7, 0.8, 2.5),
        origin=(-12.0, 5.5, 30.25),
        direction=np.eye(3),
    )


@pytest.mark.parametrize("ext", [".nii", ".nii.gz"])
def test_nifti_roundtrip(tmp_path, rng, ext):
    vol = make_vol(rng)
    p = str(tmp_path / f"case{ext}")
    write_nifti(vol, p)
    back = read_nifti(p)
    np.testing.assert_allclose(back.data, vol.data, rtol=1e-6)
    np.testing.assert_allclose(back.spacing, vol.spacing, rtol=1e-6)
    np.testing.assert_allclose(back.origin, vol.origin, rtol=1e-5)
    np.testing.assert_allclose(back.direction, vol.direction, atol=1e-6)


@pytest.mark.parametrize(
    "dtype", [np.uint8, np.int16, np.int32, np.float32, np.float64]
)
def test_nifti_dtypes(tmp_path, rng, dtype):
    vol = make_vol(rng, dtype=dtype)
    p = str(tmp_path / "d.nii")
    write_nifti(vol, p)
    back = read_nifti(p)
    assert back.data.dtype == dtype
    np.testing.assert_array_equal(back.data, vol.data)


def test_nifti_scl_slope_applied(tmp_path, rng):
    vol = make_vol(rng, dtype=np.int16)
    p = str(tmp_path / "s.nii")
    write_nifti(vol, p)
    # patch scl_slope=2.0, scl_inter=10.0 in the written header
    raw = bytearray(open(p, "rb").read())
    struct.pack_into("<f", raw, 112, 2.0)
    struct.pack_into("<f", raw, 116, 10.0)
    open(p, "wb").write(bytes(raw))
    back = read_nifti(p)
    np.testing.assert_allclose(back.data, vol.data.astype(np.float32) * 2 + 10)


def test_nifti_big_endian(tmp_path, rng):
    """Hand-build a big-endian NIfTI and check we parse it."""
    data = (rng.random((3, 4, 5)) * 50).astype(">f4")
    hdr = bytearray(348)
    struct.pack_into(">i", hdr, 0, 348)
    struct.pack_into(">8h", hdr, 40, 3, 5, 4, 3, 1, 1, 1, 1)
    struct.pack_into(">h", hdr, 70, 16)  # float32
    struct.pack_into(">h", hdr, 72, 32)
    struct.pack_into(">8f", hdr, 76, 1, 1, 1, 1, 0, 0, 0, 0)
    struct.pack_into(">f", hdr, 108, 352.0)
    hdr[344:348] = b"n+1\x00"
    p = str(tmp_path / "be.nii")
    open(p, "wb").write(bytes(hdr) + b"\x00" * 4 + data.tobytes())
    back = read_nifti(p)
    np.testing.assert_allclose(back.data, data.astype(np.float32))


def test_nifti_4d_takes_first_timepoint(tmp_path, rng):
    """4D NIfTI → first volume (reference data_loader.py:213-218)."""
    data4 = (rng.random((2, 3, 4, 5)) * 10).astype(np.float32)  # (t,z,y,x)
    hdr = bytearray(348)
    struct.pack_into("<i", hdr, 0, 348)
    struct.pack_into("<8h", hdr, 40, 4, 5, 4, 3, 2, 1, 1, 1)
    struct.pack_into("<h", hdr, 70, 16)
    struct.pack_into("<h", hdr, 72, 32)
    struct.pack_into("<8f", hdr, 76, 1, 1, 1, 1, 1, 0, 0, 0)
    struct.pack_into("<f", hdr, 108, 352.0)
    hdr[344:348] = b"n+1\x00"
    p = str(tmp_path / "4d.nii")
    open(p, "wb").write(bytes(hdr) + b"\x00" * 4 + data4.tobytes())
    back = read_nifti(p)
    np.testing.assert_allclose(back.data, data4[0])


def test_nifti_header_probe_rejects_garbage(tmp_path):
    p = str(tmp_path / "junk.nii")
    open(p, "wb").write(b"this is not a nifti file" * 20)
    with pytest.raises(ValueError):
        read_nifti_header(p)
    # truncated gz
    p2 = str(tmp_path / "trunc.nii.gz")
    open(p2, "wb").write(gzip.compress(b"nope")[:10])
    with pytest.raises(Exception):
        read_nifti_header(p2)


@pytest.mark.parametrize("compressed", [False, True])
def test_mha_roundtrip(tmp_path, rng, compressed):
    vol = make_vol(rng)
    p = str(tmp_path / "case.mha")
    write_mha(vol, p, compressed=compressed)
    back = read_mha(p)
    np.testing.assert_allclose(back.data, vol.data, rtol=1e-6)
    np.testing.assert_allclose(back.spacing, vol.spacing, rtol=1e-6)
    np.testing.assert_allclose(back.origin, vol.origin, rtol=1e-6)


def test_dispatch_and_strip_ext(tmp_path, rng):
    vol = make_vol(rng)
    for name in ["a.nii", "b.nii.gz", "c.mha"]:
        p = str(tmp_path / name)
        write_volume(vol, p)
        back = read_volume(p)
        np.testing.assert_allclose(back.data, vol.data, rtol=1e-6)
        assert read_header(p) is not None
    with pytest.raises(ValueError):
        read_volume(str(tmp_path / "x.png"))
    assert strip_ext("case01.nii.gz") == "case01"
    assert strip_ext("case01.nii") == "case01"
    assert strip_ext("case01.mha") == "case01"


def test_volume_copy_information(rng):
    a = make_vol(rng)
    b = Volume(rng.random((7, 9, 11)).astype(np.float32))
    b.copy_information(a)
    assert b.spacing == a.spacing and b.origin == a.origin
    with pytest.raises(ValueError):
        Volume(rng.random((2, 2, 2))).copy_information(a)


def test_volume_affine_roundtrip(rng):
    a = make_vol(rng)
    b = Volume.from_affine(a.data, a.affine)
    np.testing.assert_allclose(b.spacing, a.spacing, rtol=1e-6)
    np.testing.assert_allclose(b.origin, a.origin, rtol=1e-6)
    np.testing.assert_allclose(b.direction, a.direction, atol=1e-6)


def test_nifti_multimember_gzip(tmp_path, rng):
    """bgzip-style files are several concatenated gzip members; the
    one-shot zlib reader must stitch them (nifti._read_file_bytes)."""
    vol = make_vol(rng)
    p = str(tmp_path / "case.nii.gz")
    write_nifti(vol, p)
    raw = gzip.decompress(open(p, "rb").read())
    half = len(raw) // 2
    with open(p, "wb") as f:
        f.write(gzip.compress(raw[:half]) + gzip.compress(raw[half:]))
    back = read_nifti(p)
    np.testing.assert_array_equal(back.data, vol.data)


def test_nifti_truncated_gzip_raises(tmp_path, rng):
    vol = make_vol(rng)
    p = str(tmp_path / "case.nii.gz")
    write_nifti(vol, p)
    blob = open(p, "rb").read()
    with open(p, "wb") as f:
        f.write(blob[: len(blob) // 2])
    with pytest.raises(Exception):
        read_nifti(p)
