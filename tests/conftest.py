"""Test configuration: run everything on CPU with 8 virtual devices.

This must run before jax is imported anywhere, so it lives at the top of
conftest.py. The 8-device virtual CPU mesh exercises the data-parallel and
spatial-sharding paths without TPU hardware (SURVEY.md §4's plan).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
