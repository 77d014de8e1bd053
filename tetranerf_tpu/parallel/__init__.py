from .sharding import (
    batch_sharding,
    host_batch_slice,
    initialize_multihost,
    make_global_batch,
    make_mesh,
    put_replicated,
    replicate,
    state_shardings,
    shard_batch,
)

__all__ = [
    "make_mesh",
    "state_shardings",
    "batch_sharding",
    "put_replicated",
    "replicate",
    "shard_batch",
    "host_batch_slice",
    "make_global_batch",
    "initialize_multihost",
]
