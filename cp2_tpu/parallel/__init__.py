"""SPMD utilities: mesh construction, sharding helpers, collectives."""

from cp2_tpu.parallel.mesh import (
    create_mesh,
    data_sharding,
    replicated_sharding,
    shard_batch,
    shard_pytree,
)
from cp2_tpu.parallel.collectives import (
    barrier,
    concat_all_gather,
    initialize,
    pmean_gradients,
    psum_metrics,
)

__all__ = [
    "create_mesh",
    "data_sharding",
    "replicated_sharding",
    "shard_batch",
    "shard_pytree",
    "barrier",
    "concat_all_gather",
    "initialize",
    "pmean_gradients",
    "psum_metrics",
]
