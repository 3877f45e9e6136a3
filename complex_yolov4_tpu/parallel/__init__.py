"""SPMD parallelism: device mesh, shardings, multi-host init."""

from .mesh import (
    DATA_AXIS,
    data_sharding,
    device_prefetch,
    initialize_distributed,
    local_shard_info,
    make_mesh,
    make_mesh_for_batch,
    replicate_tree,
    replicated,
    shard_batch,
)

__all__ = [
    "DATA_AXIS",
    "data_sharding",
    "device_prefetch",
    "initialize_distributed",
    "local_shard_info",
    "make_mesh",
    "make_mesh_for_batch",
    "replicate_tree",
    "replicated",
    "shard_batch",
]
