"""Fused CP2 dense pairwise loss — flash-style Pallas kernel.

The CP2 dense loss (reference builder.py:1289,1430-1437) materializes an
(N, S², S²) similarity tensor, its softmax, and a same-shape label outer
product.  At 224² (S²=196) that's small; at the lemon resolution 512²
(S²=1024) the intermediates reach hundreds of MB and dominate HBM traffic
(SURVEY §5 flags this as the "attention-like" scaling object).

This kernel computes the loss WITHOUT materializing any (S², S²) tensor
in HBM: per (sample, key-tile) grid step a q/k tile pair streams through
VMEM, the similarity block is formed on the MXU in bfloat16 (f32
accumulation), reduced immediately (softmax-over-queries statistics per
key column), and discarded.  The backward pass recomputes the block
flash-attention-style.

STATUS — measured negative result, kept as a standalone op (round-3
decision; the ``use_fused_dense_loss`` train-step flag was removed).
Measurements (v5e, PARITY.md): standalone value+grad at 512²/S²=1024 the
kernel is 1.48–1.90x FASTER than the naive XLA formulation across batch
8–256 with identical losses — but inside the full CP2 step it is ~4%
SLOWER (146.4 vs 152.8 img/s at 512² batch 8): the custom-VJP call
boundary blocks XLA from fusing the loss into the surrounding graph, and
the dense loss is <1% of a 512² step, so the fusion it forfeits outweighs
the kernel's own win.  Lesson: a custom_vjp kernel must beat XLA by more
than the fusion it forfeits at its boundary.  The op remains correct,
tested (tests/test_pallas_dense_loss.py), and available for workloads
where the pairwise object dominates (e.g. the loss alone at high
resolution); S²>2048 exceeds the Mosaic VMEM envelope (query axis is
resident) and falls back to XLA below.

Exploited structure: labels are the mask outer product a_x·b_y, so

  loss_n = Σ_y b_y · (A·lse_y − s_y) / (T · A · B)
    with  A = Σ_x a_x,  B = Σ_y b_y,
          lse_y = logsumexp_x(logits[x,y] / T),
          s_y   = Σ_x a_x · logits[x,y] / T

and the gradient w.r.t. logits is
  d[x,y] = (b_y · A · softmax_x(logits/T)[x,y] − a_x · b_y) / (T · A · B · N)

The scalar reductions A, B and the final division live in XLA (they are
trivially fused); the kernel only produces the un-normalized per-sample
total and the dq/dk tiles.  Key tiles are 128-lane multiples; the query
dimension stays resident (S² ≤ 4096 fits VMEM alongside the tiles).
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK_Y = 512  # key-tile width (lanes); clipped to padded S² when smaller


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


def _fwd_kernel(q_ref, k_ref, a_ref, b_ref, total_ref, *, temperature):
    """One (sample, key-tile): add Σ_y b_y(A·lse_y − s_y) into the total.

    Masks arrive as (1, 1, ·) blocks; the per-sample total leaves as a
    broadcast 128-lane vector (scalar VMEM stores are not lowerable).
    """
    t = pl.program_id(1)
    q = q_ref[0]                            # (S2, C) bf16
    a = a_ref[0, 0].astype(jnp.float32)     # (S2,)
    kt = k_ref[0]                           # (block_y, C) bf16
    bt = b_ref[0, 0].astype(jnp.float32)    # (block_y,)
    inv_t = 1.0 / temperature

    logits = jax.lax.dot_general(
        q, kt, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * inv_t  # (S2, block_y) f32
    m = jnp.max(logits, axis=0)
    lse = m + jnp.log(jnp.sum(jnp.exp(logits - m[None, :]), axis=0))
    s = jnp.sum(a[:, None] * logits, axis=0)
    asum = jnp.sum(a)
    part = jnp.sum(bt * (asum * lse - s))

    @pl.when(t == 0)
    def _():
        total_ref[0, 0, :] = jnp.zeros((128,), jnp.float32)

    total_ref[0, 0, :] += jnp.full((128,), part / 128.0, jnp.float32)


def _bwd_kernel(q_ref, k_ref, a_ref, b_ref, scale_ref, dq_ref, dk_ref,
                *, temperature):
    """Recompute the logits tile; emit the dk tile, accumulate dq."""
    t = pl.program_id(1)
    q = q_ref[0]
    a = a_ref[0, 0].astype(jnp.float32)
    kt = k_ref[0]
    bt = b_ref[0, 0].astype(jnp.float32)
    scale = scale_ref[0, 0, 0]  # g / (T·A·B[·N]) for this sample
    inv_t = 1.0 / temperature
    asum = jnp.sum(a)

    logits = jax.lax.dot_general(
        q, kt, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * inv_t
    m = jnp.max(logits, axis=0)
    p = jnp.exp(logits - m[None, :])
    p = p / jnp.sum(p, axis=0)[None, :]  # softmax over queries, per column
    dlogits = ((bt[None, :] * asum) * p - a[:, None] * bt[None, :]) * scale

    dlogits16 = dlogits.astype(q.dtype)

    @pl.when(t == 0)
    def _():
        dq_ref[0] = jnp.zeros_like(dq_ref[0])

    dq_ref[0] += jax.lax.dot_general(
        dlogits16, kt, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dk_ref[0] = jax.lax.dot_general(
        dlogits16, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _pad_to(x, axis, multiple):
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _dense_pair_loss(q, k, mask_a, mask_b, per_sample_avg, temperature,
                     interpret, compute_dtype):
    out, _ = _fwd(q, k, mask_a, mask_b, per_sample_avg, temperature,
                  interpret, compute_dtype)
    return out


def _prep(q, k, mask_a, mask_b, compute_dtype):
    """Pad the key axis to the tile width; MXU operands in compute_dtype."""
    s2k = k.shape[1]
    block_y = min(_BLOCK_Y, ((s2k + 127) // 128) * 128)
    q16 = q.astype(compute_dtype)
    k16 = _pad_to(k.astype(compute_dtype), 1, block_y)
    a32 = mask_a.astype(jnp.float32)
    b32 = _pad_to(mask_b.astype(jnp.float32), 1, block_y)
    return q16, k16, a32, b32, block_y


def _call_fwd(q16, k16, a32, b32, temperature, interpret, block_y):
    n, s2, c = q16.shape
    tiles = k16.shape[1] // block_y
    kernel = functools.partial(_fwd_kernel, temperature=temperature)
    total = pl.pallas_call(
        kernel,
        grid=(n, tiles),
        in_specs=[
            pl.BlockSpec((1, s2, c), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_y, c), lambda i, t: (i, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s2), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_y), lambda i, t: (i, 0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 128), lambda i, t: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 1, 128), jnp.float32),
        interpret=interpret,
    )(q16, k16, a32[:, None, :], b32[:, None, :])
    return jnp.sum(total[:, 0, :], axis=-1)  # undo the /128 lane broadcast


def _fwd(q, k, mask_a, mask_b, per_sample_avg, temperature, interpret,
         compute_dtype):
    q16, k16, a32, b32, block_y = _prep(q, k, mask_a, mask_b, compute_dtype)
    total = _call_fwd(q16, k16, a32, b32, temperature, interpret, block_y)
    # the kernel's lse/s terms already carry the 1/T logit scaling
    denom = jnp.maximum(
        mask_a.sum(axis=1) * mask_b.sum(axis=1), 1e-12
    ).astype(jnp.float32)
    per_sample = total / denom
    loss = jnp.mean(per_sample) if per_sample_avg else jnp.sum(per_sample)
    return loss, (q16, k16, a32, b32, block_y)


def _bwd(per_sample_avg, temperature, interpret, compute_dtype, residuals, g):
    q16, k16, a32, b32, block_y = residuals
    n, s2, c = q16.shape
    s2k_pad = k16.shape[1]
    tiles = s2k_pad // block_y
    # per-sample chain scale: g / (T·A·B) (·1/N for the mean reduction) —
    # the extra 1/T is d(logits)/d(sim)
    denom = jnp.maximum(a32.sum(axis=1) * b32.sum(axis=1), 1e-12) * temperature
    gscale = (g / n if per_sample_avg else g) / denom  # (n,)
    scale = jnp.broadcast_to(gscale[:, None, None], (n, 1, 128)).astype(jnp.float32)
    kernel = functools.partial(_bwd_kernel, temperature=temperature)
    dq, dk = pl.pallas_call(
        kernel,
        grid=(n, tiles),
        in_specs=[
            pl.BlockSpec((1, s2, c), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_y, c), lambda i, t: (i, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s2), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_y), lambda i, t: (i, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 128), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, s2, c), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_y, c), lambda i, t: (i, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, s2, c), jnp.float32),
            jax.ShapeDtypeStruct((n, s2k_pad, c), jnp.float32),
        ],
        interpret=interpret,
    )(q16, k16, a32[:, None, :], b32[:, None, :], scale)
    dk = dk[:, :s2, :]
    return dq, dk, None, None


_dense_pair_loss.defvjp(
    lambda q, k, a, b, avg, t, interp, cd: _fwd(q, k, a, b, avg, t, interp, cd),
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
    compute_dtype: Any = jnp.bfloat16,
) -> jax.Array:
    """Flash-style CP2 dense loss: mean over samples, no (S²,S²) in HBM.

    Equivalent to ``dense_pair_loss_reference`` (and to the reference's
    logits/labels formulation) when correspondence weights are all one —
    the CP2 default.  Similarities are formed in bfloat16 on the MXU with
    float32 accumulation; q/k are unit-norm so the logits error is
    O(1e-3·1/T).  Gradients flow to ``q`` and ``k``.
    ``interpret`` defaults to True off-TPU (Pallas interpreter), False on
    TPU (compiled Mosaic kernel).
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    if q.shape != k.shape:
        # the backward pass slices dk back to the query length — CP2 always
        # pairs same-grid views, so reject silently-wrong ragged inputs
        raise ValueError(f"q/k shape mismatch: {q.shape} vs {k.shape}")
    if q.shape[1] > 2048:
        # kernel envelope: the query axis stays VMEM-resident, so the
        # per-tile f32 logits block is S²·512·4B — beyond S²≈2048 Mosaic
        # runs out of VMEM (measured: S²=1024 compiles and wins standalone,
        # S²=4096 fails).  XLA's fused einsum+softmax handles those sizes
        # well (48ms value+grad at n=64, S²=4096), so fall back.
        return dense_pair_loss_reference(q, k, mask_a, mask_b, temperature)
    return _dense_pair_loss(q, k, mask_a, mask_b, True, temperature, interpret,
                            compute_dtype)
