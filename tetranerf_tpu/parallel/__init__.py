from .sharding import (
    batch_sharding,
    initialize_multihost,
    make_mesh,
    replicate,
    shard_batch,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicate",
    "shard_batch",
    "initialize_multihost",
]
