from cunet_tpu.parallel.mesh import (
    DATA_AXIS,
    SPACE_AXIS,
    batch_sharding,
    batch_spec,
    make_mesh,
    replicated,
    shard_batch,
)

__all__ = [
    "DATA_AXIS",
    "SPACE_AXIS",
    "batch_sharding",
    "batch_spec",
    "make_mesh",
    "replicated",
    "shard_batch",
]
