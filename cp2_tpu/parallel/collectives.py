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

import os
from typing import Any, Optional

import jax

# Env vars that mark a pre-configured multi-process JAX run (set by pod
# launchers / cluster autodetection).
_COORDINATOR_ENV_VARS = (
    "JAX_COORDINATOR_ADDRESS",
    "COORDINATOR_ADDRESS",
    "MEGASCALE_COORDINATOR_ADDRESS",
)


def _env_is_multiprocess() -> bool:
    if any(os.environ.get(k) for k in _COORDINATOR_ENV_VARS):
        return True
    # Cloud TPU pods export the worker list; one entry == single process
    # (single-chip tunnels set it too, e.g. "localhost").
    hostnames = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    return len([h for h in hostnames.split(",") if h.strip()]) > 1


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               **kwargs: Any) -> bool:
    """Multi-host bootstrap (single-controller JAX).

    Replaces the reference's ``mp.spawn`` + TCP rendezvous
    (``main.py:172-178``).  MUST run before anything touches a JAX
    backend — even ``jax.process_count()`` initialises the backend and
    turns a later ``jax.distributed.initialize`` into a no-op, so this
    function deliberately queries only process-local state (env vars and
    jax's distributed client handle) to decide what to do.

    Returns True when a distributed client is (now) active, False for a
    plain single-process run.  Initialisation errors propagate — a partly
    bootstrapped pod must fail loudly, not train on one host silently.
    """
    from jax._src import distributed as _jax_distributed

    if _jax_distributed.global_state.client is not None:
        return True  # already bootstrapped (idempotent)

    explicit = any(
        v is not None for v in (coordinator_address, num_processes, process_id)
    )
    if not explicit and not _env_is_multiprocess():
        return False  # single-process run: nothing to bootstrap

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        **kwargs,  # e.g. initialization_timeout=...
    )
    return True


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


def barrier(name: str = "cp2_barrier") -> None:
    """Host-level sync point (reference dist.barrier, main.py:485).

    No-op in single-process runs; otherwise the idiomatic JAX barrier
    (a psum over one scalar per host, blocked on by every host).
    """
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)
