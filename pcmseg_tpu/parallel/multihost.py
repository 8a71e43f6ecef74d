"""Multi-host (pod-slice) scale-out: jax.distributed + per-host data feeding.

The reference is a single-process, single-device pipeline (SURVEY.md §2.2);
single-*process* multi-chip DP/TP/SP came in round 1 via GSPMD. This module
adds the multi-controller layer a TPU pod slice needs:

  * :func:`initialize` — one-call ``jax.distributed.initialize`` wrapper
    (auto-detects TPU pod environments when called with no arguments; takes
    explicit coordinator/process arguments for CPU test clusters, where it
    also flips the collectives implementation to gloo).
  * :func:`process_local_indices` — deterministic per-host shard of a case
    list (every host computes the same global shuffle, then takes its
    slice — no coordination traffic).
  * :func:`make_global_batch` — assembles the globally-sharded batch from
    each host's locally-loaded arrays via
    ``jax.make_array_from_process_local_data`` so no host ever materializes
    the full global batch.

Under jit nothing else changes: the train step, shardings, and GSPMD
collectives are identical to the single-process path — the mesh simply
spans every process's devices.
"""

from __future__ import annotations

import warnings
from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np

from pcmseg_tpu.parallel.sharding import batch_sharding


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> None:
    """Initialize the JAX distributed runtime (idempotent).

    With no arguments, relies on jax's cluster auto-detection (TPU pod
    environments set the coordinator/process topology automatically). For
    explicit clusters — e.g. the CPU test cluster in
    tests/test_multihost.py — pass coordinator/process arguments; on CPU
    backends the gloo collectives implementation is selected so
    cross-process psum/all-gather work.
    """
    from jax._src import distributed as _dist

    # NB: probing via jax.process_count() would itself initialize the XLA
    # backend, which forbids a later jax.distributed.initialize
    if getattr(_dist.global_state, "client", None) is not None:
        return  # already initialized
    if coordinator_address is not None:
        try:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:  # noqa: BLE001 — TPU-only builds may drop the knob
            pass
    kwargs: Dict[str, Any] = {}
    if coordinator_address is not None:
        kwargs.update(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    if local_device_ids is not None:
        kwargs.update(local_device_ids=list(local_device_ids))
    jax.distributed.initialize(**kwargs)


def process_local_indices(
    indices: Sequence[int],
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
) -> list:
    """Host ``i``'s strided slice of a (filtered) case-index list.

    Every host calls this with the SAME ``indices`` (case discovery and
    filtering are deterministic), so the shards partition the list without
    any cross-host coordination. Strided (``indices[i::P]``) rather than
    contiguous so sorted case lists don't give one host all the large/early
    cases.
    """
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return list(indices)[pi::pc]


def make_global_batch(local_batch: Dict[str, Any], mesh) -> Dict[str, Any]:
    """Per-host local arrays → one globally-sharded batch on the mesh.

    Each host passes the ``local_batch`` it loaded (its contiguous slice of
    the global batch, ``global_n = local_n * process_count``);
    ``jax.make_array_from_process_local_data`` stitches the global jax.Array
    without gathering data to any single host. Non-array values (case_id
    lists) stay process-local.
    """
    out = {}
    for k, v in local_batch.items():
        if isinstance(v, np.ndarray):
            sharding = batch_sharding(mesh, v.ndim)
            out[k] = jax.make_array_from_process_local_data(sharding, v)
        else:
            out[k] = v
    return out


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def is_primary() -> bool:
    """True on the process that should write checkpoints/artifacts."""
    return jax.process_index() == 0


def barrier(tag: str, timeout_ms: int = 600_000) -> None:
    """Cross-process barrier over the COORDINATION SERVICE (gRPC) — not a
    device collective, so it is safe before any program has compiled and
    from any thread. No-op in single-process runs. ``tag`` must be unique
    per call across the job and identical across processes.

    Uses ``jax._src.distributed`` — a private API with no stability
    guarantee (no public coordination-service barrier exists in the
    pinned JAX). Guarded so a JAX internals reshuffle degrades to a
    no-op instead of killing every multihost startup path (advisor r4).
    """
    try:
        from jax._src import distributed

        client = getattr(distributed.global_state, "client", None)
    except Exception:  # pragma: no cover - depends on JAX internals
        warnings.warn(
            "jax._src.distributed unavailable in this JAX version; "
            "barrier() is a no-op (startup alignment falls back to the "
            "establish_collectives all-reduce)",
            RuntimeWarning,
            stacklevel=2,
        )
        return
    if client is None:
        return
    client.wait_at_barrier(tag, timeout_in_ms=timeout_ms)


def establish_collectives(tag: str = "pcmseg_warmup") -> None:
    """Create the cross-process device-collective context up front.

    Runs one tiny all-reduce over every device in the job while the
    processes are still aligned (its compile is seconds). The backend's
    communicator clique — on CPU clusters, the gloo context, whose
    rendezvous has a hard 30 s GetKeyValue timeout; on pods, the ICI
    launch group — is created HERE rather than at the first collective
    of the real (minutes-to-compile) program, where per-process compile
    skew on a loaded host can exceed the rendezvous window and kill the
    job (observed: 4-process CPU cluster, 1-core CI host — gloo
    DEADLINE_EXCEEDED while a peer was still compiling). Call once after
    :func:`initialize`, before building trainers. No-op single-process.
    """
    if not is_multiprocess():
        return
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    devices = np.asarray(jax.devices())
    mesh = Mesh(devices, ("x",))
    sharding = NamedSharding(mesh, PartitionSpec("x"))
    n = len(devices)
    local = [
        np.ones((1,), np.float32)
        for _ in range(len(mesh.local_devices))
    ]
    x = jax.make_array_from_single_device_arrays(
        (n,),
        sharding,
        [
            jax.device_put(arr, d)
            for arr, d in zip(local, mesh.local_devices)
        ],
    )
    total = jax.jit(
        lambda v: jax.numpy.sum(v),
        out_shardings=NamedSharding(mesh, PartitionSpec()),
    )(x)
    assert float(total) == float(n), (float(total), n)
    barrier(tag)
