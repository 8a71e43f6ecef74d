from pcmseg_tpu.parallel.sharding import (  # noqa: F401
    DATA_AXIS,
    MODEL_AXIS,
    SPATIAL_AXIS,
    batch_sharding,
    make_mesh,
    param_spec,
    replicated,
    shard_batch,
    shard_state,
)
