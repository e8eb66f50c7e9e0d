"""SPMD utilities: mesh construction, sharding helpers, collectives."""

from cp2_tpu.parallel.mesh import (
    create_mesh,
    data_sharding,
    replicated_sharding,
    shard_batch,
    shard_pytree,
)

__all__ = [
    "create_mesh",
    "data_sharding",
    "replicated_sharding",
    "shard_batch",
    "shard_pytree",
]
