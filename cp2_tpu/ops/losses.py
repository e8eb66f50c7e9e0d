"""Loss functions: InfoNCE, CP2 dense loss, BYOL, segmentation CE.

All losses are pure, statically-shaped functions.  Dynamic boolean
indexing in the reference (e.g. negative-score reshaping,
``builder.py:1332-1386``) becomes masked arithmetic so everything jits.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def l2_normalize(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    """Unit-normalize along ``axis`` (torch F.normalize semantics)."""
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, eps)


def info_nce(pos: jax.Array, neg: jax.Array, temperature: float) -> jax.Array:
    """Instance-level contrastive loss with the positive as class 0.

    Matches the reference ``ContrastiveHead`` (builder.py:150-176):
    ``CE(cat([pos, neg], 1) / T, zeros)``.

    Args:
      pos: (N, 1) positive similarities.
      neg: (N, K) negative similarities.
    """
    logits = jnp.concatenate([pos, neg], axis=1) / temperature
    # CE against label 0 == -log_softmax(logits)[:, 0]
    log_prob = jax.nn.log_softmax(logits, axis=1)
    return -jnp.mean(log_prob[:, 0])


def moco_logits(q: jax.Array, k: jax.Array, queue: jax.Array):
    """(l_pos, l_neg) similarities against the in-batch key and the queue.

    Args:
      q, k: (N, C) normalized embeddings.
      queue: (K, C) normalized negative bank (stored row-major; the
        reference keeps it (C, K), builder.py:476-482 — row-major is the
        natural layout for an ``nk,kc`` matmul on the MXU).
    """
    l_pos = jnp.einsum("nc,nc->n", q, k)[:, None]
    l_neg = jnp.einsum("nc,kc->nk", q, jax.lax.stop_gradient(queue))
    return l_pos, l_neg


def cp2_dense_loss(
    logits_dense: jax.Array,
    labels_dense: jax.Array,
    temperature: float,
) -> jax.Array:
    """CP2's dense pairwise contrastive loss (reference builder.py:1430-1437).

    ``logits_dense`` (N, X, Y) are (optionally corr-weighted) pixel-pair
    similarities; softmax runs over the QUERY axis (dim 1), and the
    positive mass is averaged over foreground pairs per sample.
    """
    n = logits_dense.shape[0]
    log_sm = jax.nn.log_softmax(logits_dense / temperature, axis=1)
    labels = labels_dense.reshape(n, -1)
    num = jnp.sum((-log_sm).reshape(n, -1) * labels, axis=1)
    den = jnp.maximum(labels.sum(axis=1), 1e-12)
    return jnp.mean(num / den)


def byol_loss(x: jax.Array, y: jax.Array) -> jax.Array:
    """2 - 2·cosine similarity, per sample (reference builder.py:1080-1083)."""
    x = l2_normalize(x, axis=-1)
    y = l2_normalize(y, axis=-1)
    return 2.0 - 2.0 * jnp.einsum("nc,nc->n", x, y)


def softmax_cross_entropy(
    logits: jax.Array,
    labels: jax.Array,
    ignore_index: Optional[int] = None,
    sample_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Mean pixel CE for NHWC logits against integer labels (N, H, W).

    Matches torch ``nn.CrossEntropyLoss(reduction='none').mean()`` as used
    by the finetune module (reference segment_network.py:171,237-239).
    ``sample_mask`` (N,) bool drops whole rows (padded eval batches) from
    the mean.
    """
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    # select the label channel with a fused compare-select-reduce instead of
    # take_along_axis: the per-pixel gather serializes on TPU (measured 28%
    # of the finetune step at 352^2 vs ~0 for this form)
    classes = jnp.arange(log_probs.shape[-1], dtype=labels.dtype)
    picked = jnp.sum(
        jnp.where(labels[..., None] == classes, log_probs, 0.0), axis=-1
    )
    valid = jnp.ones(picked.shape, bool)
    if ignore_index is not None:
        valid &= labels != ignore_index
    if sample_mask is not None:
        valid &= sample_mask.reshape((-1,) + (1,) * (picked.ndim - 1))
    if ignore_index is None and sample_mask is None:
        return -jnp.mean(picked)
    return -jnp.sum(picked * valid) / jnp.maximum(valid.sum(), 1)


def negative_reshape(
    logits_dense: jax.Array,
    labels_dense: jax.Array,
    negative_type: str,
    negative_scale: float,
    negative_average: Optional[jax.Array] = None,
    negative_median: Optional[jax.Array] = None,
) -> jax.Array:
    """Post-process negative pair similarities (reference builder.py:1332-1386).

    The reference mutates negatives in place via boolean indexing; here the
    same transforms are expressed as fixed-shape ``where`` selects:

      FIXED:   neg -> 2·sigmoid(scale·neg) - 1          (= tanh(scale·neg/2))
      AVERAGE: neg -> 2·sigmoid(scale·(neg - mean_neg)) - 1
      MEDIAN:  neg -> 2·sigmoid(scale·(neg - median_neg)) - 1
      HARD:    scale negatives above their 75th percentile by 1.5
      NONE:    identity
    """
    is_neg = ~labels_dense.astype(bool)

    def squash(x):
        return 2.0 / (1.0 + jnp.exp(-x * negative_scale)) - 1.0

    if negative_type == "NONE":
        return logits_dense
    if negative_type == "FIXED":
        return jnp.where(is_neg, squash(logits_dense), logits_dense)
    if negative_type == "AVERAGE":
        shift = jax.lax.stop_gradient(negative_average).reshape(-1, 1, 1)
        return jnp.where(is_neg, squash(logits_dense - shift), logits_dense)
    if negative_type == "MEDIAN":
        shift = jax.lax.stop_gradient(negative_median).reshape(-1, 1, 1)
        return jnp.where(is_neg, squash(logits_dense - shift), logits_dense)
    if negative_type == "HARD":
        # global 75th percentile of the negatives, computed as a segment
        # quantile after one negatives-first unstable sort — same linear
        # law as jnp.nanquantile(where(is_neg, x, nan), 0.75) without the
        # NaN squashing or the stable-sort iota operand (this runs in the
        # TRAIN step for NegativeType.HARD)
        flat = logits_dense.reshape(-1).astype(jnp.float32)
        neg = is_neg.reshape(-1)
        _, svals = jax.lax.sort(
            ((~neg).astype(jnp.int32), flat), num_keys=2, dimension=0,
            is_stable=False,
        )
        n = jnp.sum(neg)
        pos = 0.75 * (n.astype(jnp.float32) - 1.0)
        low = jnp.clip(jnp.floor(pos), 0.0, None)
        frac = pos - low
        lo_i = low.astype(jnp.int32)
        hi_i = jnp.clip(jnp.ceil(pos), 0.0, None).astype(jnp.int32)
        lo_v = jax.lax.dynamic_index_in_dim(svals, lo_i, keepdims=False)
        hi_v = jax.lax.dynamic_index_in_dim(svals, hi_i, keepdims=False)
        q75 = jnp.where(n > 0, lo_v * (1.0 - frac) + hi_v * frac,
                        jnp.float32(jnp.nan))
        hard = is_neg & (logits_dense > q75)
        return jnp.where(hard, logits_dense * 1.5, logits_dense)
    raise NotImplementedError(f"negative_type={negative_type!r}")


def row_quantiles_linear(x: jax.Array, qs=(0.25, 0.5, 0.75)) -> jax.Array:
    """Per-row quantiles at static fractions via ONE value-only sort.

    Same linear-interpolation law as ``jnp.quantile(x, qs, axis=1)``
    (index = q·(K−1), floor/ceil blend), but the interpolation positions
    are static so no index payload rides through the sort — on TPU that
    halves the sort traffic of the (N, 65536) negative-score quartiles
    (sort.29, 5.9% of the metrics-on pretrain step in the r3 profile).
    Returns shape ``(len(qs), N)``.
    """
    # is_stable=False: stability is unobservable for a payload-free value
    # sort, and the TPU lowering of a stable sort drags an s32 iota
    # tiebreaker through the whole sort (+50-100% traffic).
    s = jax.lax.sort(x, dimension=1, is_stable=False)
    k = x.shape[1]
    rows = []
    for q in qs:
        pos = q * (k - 1)
        i0 = int(pos)
        i1 = min(i0 + 1, k - 1)
        frac = pos - i0
        a, b = s[:, i0], s[:, i1]
        rows.append(a + (b - a) * frac)
    return jnp.stack(rows)


def topk_accuracy(logits: jax.Array, labels: jax.Array, ks=(1, 5)):
    """Top-k accuracy in percent (reference builder.py:1690-1706).

    Sort-free rank query: the label sits in the stable descending order
    after every strictly-greater score and every equal score at a lower
    column index, so ``rank = #greater + #equal-before`` and top-k is
    ``rank < k`` — bit-identical to ``argsort(-logits)`` membership (JAX
    sorts are stable) without the (N, K+1) sort, which was 8.2% of the
    metrics-on pretrain step at K=65536 (sort.6 in the r3 profile).
    """
    cols = jnp.arange(logits.shape[1])[None, :]
    is_label = cols == labels[:, None]
    # one-hot reduce instead of take_along_axis (gather-free hot path)
    score = jnp.sum(jnp.where(is_label, logits, 0), axis=1, keepdims=True)
    rank = jnp.sum(
        (logits > score) | ((logits == score) & (cols < labels[:, None])),
        axis=1,
    )
    return [100.0 * jnp.mean((rank < k).astype(jnp.float32)) for k in ks]
