"""Pretrain train-state: params, EMA twin, BN stats, queues, optimizer.

The reference's ``MODEL`` holds two stateful encoders plus queue buffers
mutated in-place under ``torch.no_grad`` (builder.py:277-649).  Here every
piece of mutable state is an explicit field of a flax struct; one train
step is a pure ``state -> state`` transition, which is what lets the whole
thing live under a single jit/pjit with donated buffers.

EMA semantics: the momentum update touches *parameters only* — BN running
statistics are NOT averaged (the reference iterates ``.parameters()``,
builder.py:557-567, which excludes buffers); the key encoder's stats
evolve through its own forwards, reproduced here by keeping a separate
``ema_batch_stats`` collection updated by the key-path forward.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax.struct import dataclass as flax_dataclass, field

from cp2_tpu.ssl.hparams import SSLHyperParams
from cp2_tpu.ssl.queue import init_queue


@flax_dataclass
class PretrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    ema_params: Any
    ema_batch_stats: Any
    opt_state: Any
    queue: jax.Array       # (K, dim) instance-level negatives
    queue_ptr: jax.Array
    queue2: jax.Array      # (K, dim) dense/pooled negatives (DenseCL family)
    queue2_ptr: jax.Array

    def ema_update(self, momentum: float) -> "PretrainState":
        """EMA of the online params into the key params (builder.py:557-567)."""
        new_ema = jax.tree_util.tree_map(
            lambda k, q: k * momentum + q.astype(k.dtype) * (1.0 - momentum),
            self.ema_params,
            self.params,
        )
        return self.replace(ema_params=new_ema)


def create_pretrain_state(
    rng: jax.Array,
    model,
    tx: optax.GradientTransformation,
    hp: SSLHyperParams,
    sample_input: jax.Array,
    init_fn: Optional[Callable] = None,
) -> PretrainState:
    """Initialize params (key = exact copy of query, builder.py:464-469),
    queues, and optimizer state."""
    init_rng, q_rng, q2_rng = jax.random.split(rng, 3)
    # jit the init: eager flax init dispatches hundreds of small ops
    # one-by-one (minutes through a high-latency device tunnel); one
    # compiled program is also persistent-cache friendly. Same values —
    # init is pure and PRNG-deterministic.
    if init_fn is None:
        variables = jax.jit(
            lambda r, x: model.init(r, x, train=False)
        )(init_rng, sample_input)
    else:
        variables = jax.jit(
            lambda r, x: init_fn(model, r, x)
        )(init_rng, sample_input)
    params = variables.get("params", {})
    batch_stats = variables.get("batch_stats", {})
    return PretrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        ema_params=jax.tree_util.tree_map(jnp.copy, params),
        ema_batch_stats=jax.tree_util.tree_map(jnp.copy, batch_stats),
        opt_state=tx.init(params),
        queue=init_queue(q_rng, hp.queue_len, hp.dim),
        queue_ptr=jnp.zeros((), jnp.int32),
        queue2=init_queue(q2_rng, hp.queue_len, hp.dim),
        queue2_ptr=jnp.zeros((), jnp.int32),
    )
