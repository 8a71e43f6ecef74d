from pcmseg_tpu.parallel.sharding import (  # noqa: F401
    make_mesh,
    batch_sharding,
    replicated,
    shard_batch,
    shard_state,
)
