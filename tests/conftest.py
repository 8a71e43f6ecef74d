"""Test configuration: run everything on CPU with 8 virtual devices.

The environment's sitecustomize registers the 'axon' TPU backend at
interpreter start (importing jax before conftest runs), so JAX_PLATFORMS
in os.environ is too late — force the platform through jax.config instead.
XLA_FLAGS is read lazily at first backend init, so setting it here still
works. The 8-device virtual CPU mesh exercises the data-parallel and
spatial-sharding paths without TPU hardware (SURVEY.md §4's plan).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from __graft_entry__ import force_host_device_count_flags  # noqa: E402

# force exactly 8 virtual devices (replace any preset count)
os.environ["XLA_FLAGS"] = force_host_device_count_flags(
    os.environ.get("XLA_FLAGS", ""), 8
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compile cache: the 1-core host takes minutes per model compile;
# cached reruns of the suite are ~10x faster
from pcmseg_tpu.core.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

# keep the preprocessing cache (config default 'auto') out of ~/.cache
# during tests: content keys make cross-test collisions impossible, but
# tmpdir-generated synthetic trees would still accrete entries there.
# One STABLE directory (not mkdtemp-per-run, which would leak a populated
# dir per pytest invocation) — the OS tmp reaper bounds it.
import tempfile  # noqa: E402

os.environ.setdefault(
    "PCMSEG_CACHE_DIR",
    os.path.join(tempfile.gettempdir(), "pcmseg_test_preproc_cache"),
)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu_mesh():
    assert jax.default_backend() == "cpu", (
        f"tests must run on CPU, got {jax.default_backend()}"
    )
    assert jax.device_count() == 8, (
        f"expected 8 virtual CPU devices, got {jax.device_count()}"
    )
    yield


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
