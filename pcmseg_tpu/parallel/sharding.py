"""Device mesh + sharding layout for data-parallel / spatially-sharded training.

The reference is strictly single-device (SURVEY.md §2.2: no
torch.distributed/NCCL anywhere); this module is the TPU-native upgrade:

  * A 2-D ``Mesh(('data', 'spatial'))``. Batches are sharded over 'data'
    (classic DP) and the D spatial axis over 'spatial' (the volumetric
    analog of sequence/context parallelism — GSPMD performs the halo
    exchanges that 3D convolutions need across spatially-split shards
    automatically, riding ICI).
  * Parameters and optimizer state are replicated; XLA inserts the gradient
    all-reduce (psum over 'data') because the loss is a global reduction
    over a data-sharded batch.
  * BatchNorm statistics are computed over the *global* batch under jit, so
    cross-replica BN sync is automatic — no hand-written collective.

Everything compiles identically on 1 device (trivial mesh) and on N chips.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"


def make_mesh(
    data_parallel: int = -1,
    spatial_parallel: int = 1,
    devices: Optional[list] = None,
) -> Mesh:
    """Create a ('data', 'spatial') mesh over the available devices.

    ``data_parallel=-1`` means "all devices not used by spatial_parallel".
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if spatial_parallel < 1:
        raise ValueError("spatial_parallel must be >= 1")
    if data_parallel == -1:
        if n % spatial_parallel:
            raise ValueError(
                f"{n} devices not divisible by spatial_parallel={spatial_parallel}"
            )
        data_parallel = n // spatial_parallel
    if data_parallel * spatial_parallel > n:
        raise ValueError(
            f"mesh {data_parallel}x{spatial_parallel} needs more than {n} devices"
        )
    dev_array = np.asarray(devices[: data_parallel * spatial_parallel]).reshape(
        data_parallel, spatial_parallel
    )
    return Mesh(dev_array, (DATA_AXIS, SPATIAL_AXIS))


def batch_sharding(mesh: Mesh, ndim: int = 5) -> NamedSharding:
    """Sharding for a batch tensor: N over 'data', D (axis 1) over 'spatial'."""
    spec = [None] * ndim
    spec[0] = DATA_AXIS
    if ndim >= 2 and mesh.shape[SPATIAL_AXIS] > 1:
        spec[1] = SPATIAL_AXIS
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """device_put a {'image','label',...} pytree with batch sharding.

    Non-array leaves (e.g. case_id strings) pass through untouched.
    """

    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            return jax.device_put(x, batch_sharding(mesh, x.ndim))
        return x

    return jax.tree.map(put, batch)


def shard_state(state: Any, mesh: Mesh) -> Any:
    """Replicate a train state (params/opt/batch_stats) across the mesh."""
    rep = replicated(mesh)
    return jax.tree.map(
        lambda x: jax.device_put(x, rep) if hasattr(x, "ndim") else x, state
    )
