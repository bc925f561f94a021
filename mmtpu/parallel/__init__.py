from mmtpu.parallel.mesh import (
    MeshConfig,
    batch_sharding,
    create_mesh,
    get_default_mesh,
    replicate,
    set_default_mesh,
    shard_batch,
)

__all__ = [
    "MeshConfig",
    "batch_sharding",
    "create_mesh",
    "get_default_mesh",
    "replicate",
    "set_default_mesh",
    "shard_batch",
]
