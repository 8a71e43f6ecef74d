"""Device mesh + sharding layout: DP, spatial, and tensor parallelism.

The reference is strictly single-device (SURVEY.md §2.2: no
torch.distributed/NCCL anywhere); this module is the TPU-native upgrade:

  * A 3-D ``Mesh(('data', 'spatial', 'model'))``:
      - 'data'    — classic batch DP. Parameters replicated across it; the
        global-reduction loss makes XLA insert the gradient all-reduce.
      - 'spatial' — the volume's D axis (the volumetric analog of
        sequence/context parallelism); GSPMD performs the halo exchanges
        3D convolutions need across spatially-split shards, riding ICI.
      - 'model'   — tensor parallelism: conv kernels' output-channel axis
        (and matching bias/BN/optimizer-moment channels) sharded; GSPMD
        inserts the activation collectives. Optional — the 90M-param model
        fits one chip, so TP is for scale-out headroom, not necessity.
  * BatchNorm statistics are computed over the *global* batch under jit,
    so cross-replica BN sync is automatic — no hand-written collective.

Everything compiles identically on 1 device (trivial mesh) and on N chips.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"
MODEL_AXIS = "model"


def make_mesh(
    data_parallel: int = -1,
    spatial_parallel: int = 1,
    model_parallel: int = 1,
    devices: Optional[list] = None,
) -> Mesh:
    """Create a ('data', 'spatial', 'model') mesh over available devices.

    ``data_parallel=-1`` means "all devices not used by the other axes".
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if spatial_parallel < 1 or model_parallel < 1:
        raise ValueError("spatial_parallel/model_parallel must be >= 1")
    other = spatial_parallel * model_parallel
    if data_parallel == -1:
        if n % other:
            raise ValueError(
                f"{n} devices not divisible by spatial*model={other}"
            )
        data_parallel = n // other
    total = data_parallel * other
    if total > n:
        raise ValueError(
            f"mesh {data_parallel}x{spatial_parallel}x{model_parallel} "
            f"needs more than {n} devices"
        )
    dev_array = np.asarray(devices[:total]).reshape(
        data_parallel, spatial_parallel, model_parallel
    )
    return Mesh(dev_array, (DATA_AXIS, SPATIAL_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh, ndim: int = 5) -> NamedSharding:
    """Sharding for a batch tensor: N over 'data', D (axis 1) over 'spatial'."""
    spec = [None] * ndim
    spec[0] = DATA_AXIS
    if ndim >= 2 and mesh.shape.get(SPATIAL_AXIS, 1) > 1:
        spec[1] = SPATIAL_AXIS
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_spec(shape, tp: int) -> P:
    """Tensor-parallel PartitionSpec for a parameter/moment leaf, by shape.

    Shards the trailing (output-channel) axis over 'model' when divisible:
    conv/transpose kernels (kd,kh,kw,I,O), biases (O,), BN scale/bias and
    running stats (C,). Indivisible or scalar leaves stay replicated.
    """
    if tp <= 1 or not shape:
        return P()
    if shape[-1] % tp != 0:
        return P()  # e.g. outc's n_classes=1, the 5-channel input conv's I
    return P(*([None] * (len(shape) - 1) + [MODEL_AXIS]))


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
    """Place a train state on the mesh.

    With a trivial 'model' axis everything is replicated (pure DP). With
    model_parallel > 1, every channel-bearing leaf (params, Adam moments,
    BN stats — matched purely by shape) shards its trailing axis over
    'model'; GSPMD propagates the activation shardings and inserts the TP
    collectives.
    """
    tp = mesh.shape.get(MODEL_AXIS, 1)
    rep = replicated(mesh)

    def put(x):
        if not hasattr(x, "ndim"):
            return x
        if tp > 1 and x.ndim >= 1:
            return jax.device_put(x, NamedSharding(mesh, param_spec(x.shape, tp)))
        return jax.device_put(x, rep)

    return jax.tree.map(put, state)
