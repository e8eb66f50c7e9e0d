"""Fused CP2 dense pairwise loss — flash-style Pallas kernel.

The CP2 dense loss (reference builder.py:1289,1430-1437) materializes an
(N, S², S²) similarity tensor, its softmax, and a same-shape label outer
product.  At 224² (S²=196) that's small; at the lemon resolution 512²
(S²=1024) the intermediates reach hundreds of MB and dominate HBM traffic
(SURVEY §5 flags this as the "attention-like" scaling object).

This kernel computes the loss WITHOUT materializing any (S², S²) tensor
in HBM: per sample, q/k tiles stream through VMEM, the similarity block
is formed on the MXU, reduced immediately (softmax-over-queries statistics
per key column), and discarded.  The backward pass recomputes the block
flash-attention-style.

Exploited structure: labels are the mask outer product a_x·b_y, so

  loss_n = Σ_y b_y · (A·lse_y − s_y) / (T · A · B)
    with  A = Σ_x a_x,  B = Σ_y b_y,
          lse_y = logsumexp_x(logits[x,y] / T),
          s_y   = Σ_x a_x · logits[x,y] / T

and the gradient w.r.t. logits is
  d[x,y] = (b_y · A · softmax_x(logits/T)[x,y] − a_x · b_y) / (T · A · B · N)

Columns (keys) are tiled to 128 lanes; the query dimension stays resident
(S² ≤ 4096 fits VMEM alongside the tiles).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def dense_pair_loss_reference(
    q: jax.Array,       # (N, S2, C) normalized query pixels
    k: jax.Array,       # (N, S2, C) normalized key pixels
    mask_a: jax.Array,  # (N, S2) foreground mask of image a
    mask_b: jax.Array,  # (N, S2)
    temperature: float,
) -> jax.Array:
    """Naive XLA implementation (ground truth for the kernel)."""
    logits = jnp.einsum("nxc,nyc->nxy", q, k) / temperature
    labels = jnp.einsum("nx,ny->nxy", mask_a, mask_b)
    log_sm = jax.nn.log_softmax(logits, axis=1)
    n = q.shape[0]
    num = jnp.sum((-log_sm).reshape(n, -1) * labels.reshape(n, -1), axis=1)
    den = jnp.maximum(labels.reshape(n, -1).sum(axis=1), 1e-12)
    return jnp.mean(num / den)


def _fwd_kernel(q_ref, k_ref, a_ref, b_ref, loss_ref, *, temperature, block_y):
    """One sample: accumulate Σ_y b_y(A·lse_y − s_y) over key tiles.

    Masks arrive as (1, 1, S2) blocks and the loss leaves through SMEM —
    layouts chosen to satisfy the TPU (8, 128) tiling rules for any batch.
    """
    q = q_ref[0].astype(jnp.float32)  # (S2, C)
    a = a_ref[0, 0].astype(jnp.float32)  # (S2,)
    a2d = a[:, None]
    s2 = q.shape[0]
    inv_t = 1.0 / temperature

    asum = jnp.sum(a)
    total = jnp.zeros((), jnp.float32)
    bsum = jnp.zeros((), jnp.float32)

    num_tiles = k_ref.shape[1] // block_y

    def body(t, carry):
        total, bsum = carry
        kt = k_ref[0, pl.ds(t * block_y, block_y), :].astype(jnp.float32)
        bt = b_ref[0, 0, pl.ds(t * block_y, block_y)].astype(jnp.float32)
        logits = jax.lax.dot_general(
            q, kt, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * inv_t  # (S2, block_y)
        m = jnp.max(logits, axis=0)
        lse = m + jnp.log(jnp.sum(jnp.exp(logits - m[None, :]), axis=0))
        s = jnp.sum(a2d * logits, axis=0)
        total = total + jnp.sum(bt * (asum * lse - s))
        bsum = bsum + jnp.sum(bt)
        return total, bsum

    total, bsum = jax.lax.fori_loop(0, num_tiles, body, (total, bsum))
    # vector store (scalar stores to VMEM are not lowerable); host reads lane 0
    loss_ref[0, 0, :] = jnp.full((128,), total / jnp.maximum(asum * bsum, 1e-12),
                                 jnp.float32)


def _bwd_kernel(q_ref, k_ref, a_ref, b_ref, g_ref, dq_ref, dk_ref,
                *, temperature, block_y):
    """Recompute logits per tile; emit dq, dk for one sample."""
    q = q_ref[0].astype(jnp.float32)
    a = a_ref[0, 0].astype(jnp.float32)
    g = g_ref[0, 0, 0]
    inv_t = 1.0 / temperature
    asum = jnp.sum(a)

    num_tiles = k_ref.shape[1] // block_y

    # pass 1: B (key-mask total) for the normalizer
    bsum = jnp.sum(b_ref[0, 0].astype(jnp.float32))
    scale = g / jnp.maximum(asum * bsum, 1e-12) * inv_t

    dq_ref[0] = jnp.zeros_like(dq_ref[0])

    def body(t, dq_acc):
        kt = k_ref[0, pl.ds(t * block_y, block_y), :].astype(jnp.float32)
        bt = b_ref[0, 0, pl.ds(t * block_y, block_y)].astype(jnp.float32)
        logits = jax.lax.dot_general(
            q, kt, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * inv_t
        m = jnp.max(logits, axis=0)
        p = jnp.exp(logits - m[None, :])
        p = p / jnp.sum(p, axis=0)[None, :]  # softmax over queries, per column
        dlogits = (bt[None, :] * asum * p - a[:, None] * bt[None, :]) * scale
        dq_acc = dq_acc + jax.lax.dot_general(
            dlogits, kt, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dk_ref[0, pl.ds(t * block_y, block_y), :] = jax.lax.dot_general(
            dlogits, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return dq_acc

    dq = jax.lax.fori_loop(0, num_tiles, body, jnp.zeros_like(q))
    dq_ref[0] = dq


def _pad_to(x, axis, multiple):
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _dense_pair_loss(q, k, mask_a, mask_b, per_sample_avg, temperature, interpret):
    out, _ = _fwd(q, k, mask_a, mask_b, per_sample_avg, temperature, interpret)
    return out


def _call_fwd(q, k, mask_a, mask_b, temperature, interpret, block_y):
    n, s2, c = q.shape
    kernel = functools.partial(_fwd_kernel, temperature=temperature, block_y=block_y)
    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, s2, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k.shape[1], c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k.shape[1]), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 1, 128), jnp.float32),
        interpret=interpret,
    )(q, k, mask_a[:, None, :], mask_b[:, None, :])


def _fwd(q, k, mask_a, mask_b, per_sample_avg, temperature, interpret):
    block_y = 128
    q32 = q.astype(jnp.float32)
    k32 = _pad_to(k.astype(jnp.float32), 1, block_y)
    a32 = mask_a.astype(jnp.float32)
    b32 = _pad_to(mask_b.astype(jnp.float32), 1, block_y)
    per_sample = _call_fwd(q32, k32, a32, b32, temperature, interpret, block_y)[:, 0, 0]
    loss = jnp.mean(per_sample) if per_sample_avg else jnp.sum(per_sample)
    return loss, (q32, k32, a32, b32)


def _bwd(per_sample_avg, temperature, interpret, residuals, g):
    q32, k32, a32, b32 = residuals
    n, s2, c = q32.shape
    block_y = 128
    g_per = jnp.broadcast_to(
        g / n if per_sample_avg else g, (n, 1, 128)
    ).astype(jnp.float32)
    kernel = functools.partial(_bwd_kernel, temperature=temperature, block_y=block_y)
    dq, dk = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, s2, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k32.shape[1], c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k32.shape[1]), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, s2, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k32.shape[1], c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, s2, c), jnp.float32),
            jax.ShapeDtypeStruct((n, k32.shape[1], c), jnp.float32),
        ],
        interpret=interpret,
    )(q32, k32, a32[:, None, :], b32[:, None, :], g_per)
    dk = dk[:, : s2, :]
    return dq, dk, None, None


_dense_pair_loss.defvjp(
    lambda q, k, a, b, avg, t, interp: _fwd(q, k, a, b, avg, t, interp),
    _bwd,
)


def dense_pair_loss(
    q: jax.Array,
    k: jax.Array,
    mask_a: jax.Array,
    mask_b: jax.Array,
    temperature: float = 1.0,
    *,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Flash-style CP2 dense loss: mean over samples, no (S²,S²) in HBM.

    Equivalent to ``dense_pair_loss_reference`` (and to the reference's
    logits/labels formulation) when correspondence weights are all one —
    the CP2 default.  Gradients flow to ``q`` and ``k``.
    ``interpret`` defaults to True off-TPU (Pallas interpreter), False on
    TPU (compiled Mosaic kernel).
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    return _dense_pair_loss(q, k, mask_a, mask_b, True, temperature, interpret)
