"""Persistent XLA compilation cache.

On the single-core hosts that front TPU slices, compiling the 90M-param
U-Net takes minutes per (shape, config) variant; the persistent cache cuts
repeat startups ~10x (measured 69s → 7s for the tiny test model). Enabled
by the CLI, bench, entry points, and the test suite. Opt out with
PCMSEG_COMPILE_CACHE=0; point elsewhere with PCMSEG_COMPILE_CACHE=<dir>.
"""

from __future__ import annotations

import os
from typing import Optional

_DEFAULT = os.path.expanduser("~/.cache/pcmseg_jax")
_enabled = False


def enable_compilation_cache(path: Optional[str] = None) -> Optional[str]:
    """Idempotently enable the persistent compile cache; returns the dir."""
    global _enabled
    env = os.environ.get("PCMSEG_COMPILE_CACHE")
    if env == "0":
        return None
    path = path or env or _DEFAULT
    if _enabled:
        return path
    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _enabled = True
    return path
