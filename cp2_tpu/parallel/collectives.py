"""Explicit collectives + multi-host bootstrap.

Under global-view jit the reference's collective inventory (SURVEY §2.3)
is implicit; these wrappers exist for ``shard_map``/``pmap`` contexts
where per-device code wants the reference's exact primitives, and for
multi-host process bootstrap.

| reference (NCCL via torch.distributed)     | here                        |
|--------------------------------------------|-----------------------------|
| init_process_group (main.py:172-178)       | ``initialize()``            |
| concat_all_gather (builder.py:1710-1722)   | ``concat_all_gather``       |
| broadcast of shuffle idx (builder.py:621)  | shared PRNG key (no comm)   |
| DDP grad allreduce                         | ``pmean_gradients``         |
| SyncBN stat reduction                      | BatchNorm(axis_name=...)    |
| barrier (main.py:485)                      | ``barrier()``               |
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Multi-host bootstrap (single-controller JAX).

    On TPU pods the runtime auto-discovers topology; arguments are only
    needed for manual setups.  Replaces mp.spawn + TCP rendezvous.
    """
    if jax.process_count() > 1:
        return  # already initialized
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (ValueError, RuntimeError):
        pass  # single-process run


def concat_all_gather(x: jax.Array, axis_name: str = "data") -> jax.Array:
    """All-gather along the leading dim, no gradient (builder.py:1710-1722).

    Valid inside shard_map/pmap over ``axis_name``.  Under plain jit the
    batch is already global — this is then an identity by construction.
    """
    gathered = jax.lax.all_gather(jax.lax.stop_gradient(x), axis_name)
    return gathered.reshape((-1,) + x.shape[1:])


def pmean_gradients(grads: Any, axis_name: str = "data") -> Any:
    """Cross-replica gradient averaging (DDP allreduce equivalent)."""
    return jax.lax.pmean(grads, axis_name)


def psum_metrics(metrics: Any, axis_name: str = "data") -> Any:
    """Sum metric accumulators (e.g. confusion counts) across replicas —
    the torchmetrics ``sync_dist`` equivalent as one psum."""
    return jax.lax.psum(metrics, axis_name)


def barrier() -> None:
    """Host-level sync point (reference dist.barrier, main.py:485)."""
    x = jnp.zeros(())
    jax.block_until_ready(
        jax.pmap(lambda v: jax.lax.psum(v, "i"), axis_name="i")(
            jnp.zeros((jax.local_device_count(),))
        )
    )
    del x
