"""Profiling hooks: step-window tracing reachable and functional."""

import jax
import jax.numpy as jnp


def test_step_trace_controller_writes_dump(tmp_path):
    from pcmseg_tpu.utils.profiling import StepTraceController

    c = StepTraceController(str(tmp_path), start_step=1, n_steps=2)
    f = jax.jit(lambda x: x * 2.0)
    for i in range(5):
        c.on_step(i)
        f(jnp.ones(8)).block_until_ready()
    c.close()
    dumped = [p for p in tmp_path.rglob("*") if p.is_file()]
    assert dumped, "no profiler dump written"


def test_trace_controller_none_is_noop():
    from pcmseg_tpu.utils.profiling import StepTraceController

    c = StepTraceController(None)
    for i in range(3):
        c.on_step(i)
    c.close()  # must not raise


def test_trace_survives_epochs_shorter_than_start_step(tmp_path):
    """One-step epochs (tiny datasets) + per-epoch close() must still
    capture a window in a later epoch, not disarm silently."""
    from pcmseg_tpu.utils.profiling import StepTraceController

    c = StepTraceController(str(tmp_path), start_step=1, n_steps=1)
    f = jax.jit(lambda x: x + 1.0)
    for _epoch in range(4):  # each epoch: ONE step then close()
        c.on_step(0)
        f(jnp.ones(4)).block_until_ready()
        c.close()
    dumped = [p for p in tmp_path.rglob("*") if p.is_file()]
    assert dumped, "profiler dump lost to the short-epoch latch"
