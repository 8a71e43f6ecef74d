"""Profiling hooks: jax.profiler traces + simple step annotations.

The reference had no tracing at all (SURVEY.md §5); here a config-free
context manager wraps any region in a TensorBoard-compatible XLA trace,
and ``annotate`` marks named host spans inside it.

Usage:
    from pcmseg_tpu.utils.profiling import trace, annotate
    with trace("/tmp/pcmseg_trace"):
        for step in range(10):
            with annotate(f"step{step}"):
                state, m = train_step(state, batch)
"""

from __future__ import annotations

import contextlib
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """XLA profiler trace over the enclosed region (no-op if log_dir=None)."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named host-side span, visible in the profiler timeline."""
    return jax.profiler.TraceAnnotation(name)


class StepTraceController:
    """Traces a fixed window of training steps into a profiler dump.

    Wired to the trainer via ``config.profile_dir`` / ``--profile``: the
    trace starts at ``start_step`` (default 1, skipping the compile step)
    and stops after ``n_steps`` steps — or at ``close()`` if the epoch is
    shorter. One-shot: only the first window is captured.
    """

    def __init__(self, log_dir: Optional[str], start_step: int = 1,
                 n_steps: int = 5):
        self.log_dir = log_dir
        self.start_step = start_step
        self.n_steps = max(1, n_steps)
        self._active = False
        self._done = log_dir is None
        self._seen = 0  # GLOBAL steps observed, across epochs

    def on_step(self, step_idx: int) -> None:
        """Call at the TOP of each step. The trigger counts steps globally
        (across epochs) so --profile still captures a window when epochs
        are shorter than start_step (tiny datasets); ``step_idx`` is
        accepted for call-site readability but not trusted as a clock."""
        if self._done:
            return
        if not self._active and self._seen == self.start_step:
            jax.profiler.start_trace(self.log_dir)
            self._active = True
        elif self._active and self._seen >= self.start_step + self.n_steps:
            self.close()
        self._seen += 1

    def close(self) -> None:
        """Stop the trace if running. Called at every epoch end; if the
        trace never started (epoch shorter than start_step), stay armed so
        a later epoch's steps can still be captured — otherwise --profile
        on a tiny dataset silently produces an empty dump."""
        if self._active:
            jax.profiler.stop_trace()
            self._active = False
            self._done = True


@contextlib.contextmanager
def device_memory_report() -> Iterator[None]:
    """Print per-device memory stats after the enclosed region (best effort)."""
    try:
        yield
    finally:
        for d in jax.local_devices():
            stats = getattr(d, "memory_stats", lambda: None)()
            if stats:
                used = stats.get("bytes_in_use", 0) / 2**30
                limit = stats.get("bytes_limit", 0) / 2**30
                print(f"{d}: {used:.2f} GiB in use / {limit:.2f} GiB limit")
