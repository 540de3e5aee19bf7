from synthesis_in_style_tpu.parallel.mesh import (
    make_mesh,
    maybe_initialize_distributed,
    data_parallel_mesh,
    replicate,
    shard_batch,
    batch_sharding,
    replicated_sharding,
    local_batch_slice,
)

__all__ = [
    "make_mesh",
    "maybe_initialize_distributed",
    "data_parallel_mesh",
    "replicate",
    "shard_batch",
    "batch_sharding",
    "replicated_sharding",
    "local_batch_slice",
]
