from .sharding import (
    active_mesh,
    make_mesh,
    mesh_scope,
    register_sequences_sharded,
    replicate,
    shard_sequences,
    sharded_chamfer,
)

__all__ = [
    "make_mesh",
    "mesh_scope",
    "active_mesh",
    "shard_sequences",
    "replicate",
    "register_sequences_sharded",
    "sharded_chamfer",
]
