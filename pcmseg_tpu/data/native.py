"""ctypes binding for the native resampler (numpy fallback if unbuilt).

Loads ``native/libpcmseg_native.so`` (built by ``make -C native``); if the
library is missing or the build toolchain is absent, callers silently use
the vectorized-numpy implementation in pcmseg_tpu/data/resample.py —
identical semantics, just slower on cache-miss preprocessing.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _lib_path() -> str:
    return os.path.join(_repo_root(), "native", "libpcmseg_native.so")


def _try_build() -> bool:
    makefile_dir = os.path.join(_repo_root(), "native")
    if not os.path.exists(os.path.join(makefile_dir, "Makefile")):
        return False
    try:
        subprocess.run(
            ["make", "-C", makefile_dir],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(_lib_path())
    except Exception:  # noqa: BLE001 — toolchain missing → numpy fallback
        return False


def get_native_lib(build_if_missing: bool = True) -> Optional[ctypes.CDLL]:
    """The loaded native library, or None if unavailable."""
    global _LIB, _TRIED
    if _LIB is not None:
        return _LIB
    if _TRIED:
        return None
    _TRIED = True
    path = _lib_path()
    if not os.path.exists(path) and build_if_missing:
        if not _try_build():
            return None
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
        fp = ctypes.POINTER(ctypes.c_float)
        for fn in (lib.resample_linear_f32, lib.resample_nearest_f32):
            fn.argtypes = [fp] + [ctypes.c_int64] * 3 + [fp] + [ctypes.c_int64] * 3
            fn.restype = None
        _LIB = lib
        return lib
    except OSError:
        return None


def native_resample(
    data: np.ndarray, target_shape, mode: str = "linear"
) -> Optional[np.ndarray]:
    """Native-path resample; returns None when the library isn't available."""
    lib = get_native_lib()
    if lib is None:
        return None
    src = np.ascontiguousarray(data, dtype=np.float32)
    out = np.empty(tuple(int(t) for t in target_shape), dtype=np.float32)
    fn = (
        lib.resample_linear_f32 if mode == "linear" else lib.resample_nearest_f32
    )
    fp = ctypes.POINTER(ctypes.c_float)
    fn(
        src.ctypes.data_as(fp), *[ctypes.c_int64(s) for s in src.shape],
        out.ctypes.data_as(fp), *[ctypes.c_int64(s) for s in out.shape],
    )
    return out
