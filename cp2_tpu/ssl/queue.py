"""Functional negative-queue ops.

The reference keeps two 65536-slot queues as registered buffers mutated
in-place after an NCCL all_gather (builder.py:569-607,1710-1722).  Here the
queue is explicit train-state: enqueue is a pure scatter at wrapped
indices, computed identically on every replica because under global-view
jit each replica already sees the *global* batch of keys (the all_gather
is implicit in the sharding).  Replicated queue state therefore never
diverges.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def queue_enqueue(
    queue: jax.Array, ptr: jax.Array, keys: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Insert ``keys`` (B, C) at the pointer with wraparound.

    Matches the reference's two-segment wrapped write
    (builder.py:578-587) via modular scatter indices.  B > K is rejected
    at trace time, like the reference's assert (builder.py:578): with
    duplicate scatter indices ``.at[].set`` has unspecified write order
    in XLA, so "last K keys win" cannot be relied on.

    Returns (new_queue, new_ptr).
    """
    k = queue.shape[0]
    batch = keys.shape[0]
    if batch > k:
        raise ValueError(
            f"enqueue batch {batch} exceeds queue length {k}; shrink the "
            "global batch or grow the queue (reference asserts the same, "
            "builder.py:578)"
        )
    idx = (ptr + jnp.arange(batch, dtype=ptr.dtype)) % k
    new_queue = queue.at[idx].set(keys.astype(queue.dtype))
    new_ptr = (ptr + batch) % k
    return new_queue, new_ptr


def init_queue(rng: jax.Array, queue_len: int, dim: int) -> jax.Array:
    """Random unit-normalized queue (reference builder.py:476-482)."""
    q = jax.random.normal(rng, (queue_len, dim), jnp.float32)
    return q / jnp.linalg.norm(q, axis=1, keepdims=True)
