from synthesis_in_style_tpu.parallel.mesh import (
    make_mesh,
    data_parallel_mesh,
    replicate,
    shard_batch,
    batch_sharding,
    replicated_sharding,
    local_batch_slice,
)

__all__ = [
    "make_mesh",
    "data_parallel_mesh",
    "replicate",
    "shard_batch",
    "batch_sharding",
    "replicated_sharding",
    "local_batch_slice",
]
