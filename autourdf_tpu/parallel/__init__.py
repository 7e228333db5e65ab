from .sharding import (
    make_mesh,
    register_sequences_sharded,
    replicate,
    shard_sequences,
    sharded_chamfer,
)

__all__ = [
    "make_mesh",
    "shard_sequences",
    "replicate",
    "register_sequences_sharded",
    "sharded_chamfer",
]
