"""Pixel/region correspondence math.

Re-implements the reference semantics of CP2's correlation mapping
(``tools/correlation_mapping.py`` in the reference repo) as fully
vectorized, statically-shaped JAX — no per-sample Python loops, no
``torch.unique`` — so everything jits and shards cleanly on TPU.

Semantics pinned by the reference's analytic unit tests
(``tests/test_correlation_mapping.py:65-130`` in the reference):

  * ``get_correlation_map`` (reference ``correlation_mapping.py:141-189``):
    boolean (B, X, Y) map of id equality between two flattened id maps.
  * ``masked_iou`` (reference ``correlation_mapping.py:103-138``): set-style
    IoU over the *multiset* of visible ids.  An id counts toward the
    intersection if it occurs MORE THAN ONCE across the concatenation of
    both visible maps — note this includes ids duplicated within a single
    map, which is exactly what the reference's ``sharedIds`` fixture pins
    down.  The union is the number of distinct visible ids.
  * ``dense_loss_stats`` (reference ``correlation_mapping.py:11-53``):
    per-sample mean/quartiles of positive and negative similarity scores,
    computed with NaN-masking semantics (``nanmean``/``nanquantile``).

The reference computes the per-sample unique counts with a Python loop over
``torch.unique``; here each sample's ids are sorted once (static length
2·P + 1) and run-length boundaries give distinct/duplicate counts — an
O(B · P log P) sort that XLA vectorizes across the batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_iou(
    map_a: jax.Array,
    map_b: jax.Array,
    mask_a: jax.Array,
    mask_b: jax.Array,
) -> jax.Array:
    """IoU between the visible id sets of two id maps.

    Args:
      map_a, map_b: (B, P) id maps (any real dtype; ids compared exactly).
      mask_a, mask_b: (B, P) visibility masks in {0, 1}.

    Returns:
      (B,) float32 IoU. ``intersection`` counts distinct non-zero ids whose
      total occurrence count (over both visible maps) exceeds one; ``union``
      counts distinct non-zero ids.  Ids are shifted by +1 first so that a
      genuine id of 0 participates, while masked-out entries collapse to 0
      and are ignored — mirroring the reference exactly.
    """
    if map_a.ndim != 2 or mask_a.ndim != 2:
        raise ValueError(f"expected (B, P) maps/masks, got {map_a.shape=} {mask_a.shape=}")
    batch = map_a.shape[0]
    zeros = jnp.zeros((batch, 1), dtype=jnp.float32)
    ids = jnp.concatenate(
        [zeros, map_a.astype(jnp.float32) + 1.0, map_b.astype(jnp.float32) + 1.0],
        axis=1,
    )
    masks = jnp.concatenate(
        [zeros, mask_a.astype(jnp.float32), mask_b.astype(jnp.float32)], axis=1
    )
    # zeros (masked) sort to the front; unstable — run-length counting is
    # permutation-insensitive and TPU stable sorts drag an iota operand
    vals = jax.lax.sort(ids * masks, dimension=1, is_stable=False)

    # Run-length boundaries on the sorted values.  Position i >= 1 starts a
    # new run iff vals[i] != vals[i-1]; the run has a duplicate iff the next
    # element equals it (pad the tail with a sentinel that never matches).
    sentinel = jnp.full((batch, 1), -1.0, dtype=vals.dtype)
    nxt = jnp.concatenate([vals[:, 1:], sentinel], axis=1)
    starts = jnp.concatenate(
        [jnp.ones((batch, 1), dtype=bool), vals[:, 1:] != vals[:, :-1]], axis=1
    )
    nonzero = vals > 0
    union = jnp.sum(starts & nonzero, axis=1)
    intersection = jnp.sum(starts & nonzero & (nxt == vals), axis=1)
    return intersection.astype(jnp.float32) / jnp.maximum(union, 1).astype(jnp.float32)


def get_correlation_map(map_a: jax.Array, map_b: jax.Array) -> dict:
    """Pixel-to-pixel id correspondence between two (B, H, W) id maps.

    Returns a dict matching the reference (``correlation_mapping.py:141-189``):
      corr_map:   (B, Ha*Wa, Hb*Wb) bool, True where ids are equal.
      corr_map_a: (B, Ha*Wa) per-query match counts (sum over keys).
      corr_map_b: (B, Hb*Wb) per-key match counts (sum over queries).
      iou:        (B,) unmasked id IoU (all pixels visible).
    """
    if map_a.ndim != 3:
        raise ValueError(f"expected (B, H, W) id maps, got {map_a.shape=}")
    batch = map_a.shape[0]
    flat_a = map_a.reshape(batch, -1)
    flat_b = map_b.reshape(batch, -1)
    corr_map = flat_a[:, :, None] == flat_b[:, None, :]
    ones_a = jnp.ones_like(flat_a, dtype=jnp.float32)
    ones_b = jnp.ones_like(flat_b, dtype=jnp.float32)
    return {
        "corr_map": corr_map,
        "corr_map_a": corr_map.sum(2),
        "corr_map_b": corr_map.sum(1),
        "iou": masked_iou(flat_a, flat_b, ones_a, ones_b),
    }


def get_masked_correlation_map(
    map_a: jax.Array,
    map_b: jax.Array,
    mask_a: jax.Array,
    mask_b: jax.Array,
) -> dict:
    """Correspondence maps restricted to mask-visible pixels.

    Mirrors reference ``correlation_mapping.py:192-247``: the raw
    correspondence map is intersected with the outer product of the two
    visibility masks, and a masked IoU is computed over visible ids only.
    """
    batch = map_a.shape[0]
    results = get_correlation_map(map_a, map_b)
    flat_mask_a = mask_a.reshape(batch, -1).astype(jnp.float32)
    flat_mask_b = mask_b.reshape(batch, -1).astype(jnp.float32)
    pair_mask = jnp.einsum("nx,ny->nxy", flat_mask_a, flat_mask_b)
    corr_mask = results["corr_map"] * pair_mask
    return {
        "corr_map": results["corr_map"],
        "corr_mask": corr_mask,
        "corr_map_a": results["corr_map_a"],
        "corr_map_a_masked": corr_mask.sum(2),
        "corr_map_b": results["corr_map_b"],
        "corr_map_b_masked": corr_mask.sum(1),
        "iou": results["iou"],
        "iou_masked": masked_iou(
            map_a.reshape(batch, -1),
            map_b.reshape(batch, -1),
            flat_mask_a,
            flat_mask_b,
        ),
    }


def _nan_stats(scores: jax.Array) -> dict:
    """Per-sample NaN-masked mean and quartiles of a (B, X, Y) score tensor.

    This is the reference formulation (correlation_mapping.py:11-53) kept as
    the oracle for ``dense_loss_stats``'s cheaper single-sort rewrite
    (tests/test_contrastive_metrics.py pins their equivalence); the train
    path never calls it.
    """
    average = jnp.nanmean(scores, axis=(1, 2))
    flat = scores.reshape(scores.shape[0], -1)
    quartiles = jnp.nanquantile(flat, jnp.array([0.25, 0.5, 0.75]), axis=1)
    return {
        "quartiles": (quartiles[0], quartiles[1], quartiles[2]),
        "average": average,
    }


def _segment_quartiles(
    sorted_vals: jax.Array, start: jax.Array, count: jax.Array
) -> tuple:
    """Exact linear-interpolation quartiles of a sorted row segment.

    ``sorted_vals`` is (B, S) ascending; each row's segment is
    [start, start+count).  Replicates ``jnp.nanquantile``'s linear method
    (jax _quantile with squash_nans=True): index = q·(count−1), floor/ceil
    clamp to [0, count−1], low·(1−frac) + high·frac; empty segments → NaN.
    """
    q = jnp.array([0.25, 0.5, 0.75], jnp.float32)  # (3,)
    cnt = count.astype(jnp.float32)[:, None]  # (B, 1)
    idx = q[None, :] * (cnt - 1.0)  # (B, 3)
    low = jnp.floor(idx)
    high = jnp.ceil(idx)
    high_w = idx - low
    low_w = 1.0 - high_w
    upper = jnp.maximum(cnt - 1.0, 0.0)
    low = jnp.clip(low, 0.0, upper).astype(jnp.int32)
    high = jnp.clip(high, 0.0, upper).astype(jnp.int32)
    base = start.astype(jnp.int32)[:, None]
    gather_idx = jnp.concatenate([base + low, base + high], axis=1)  # (B, 6)
    vals = jnp.take_along_axis(sorted_vals, gather_idx, axis=1)
    low_v, high_v = vals[:, :3], vals[:, 3:]
    out = low_v * low_w + high_v * high_w
    out = jnp.where(count[:, None] > 0, out, jnp.float32(jnp.nan))
    return (out[:, 0], out[:, 1], out[:, 2])


def dense_loss_stats(logits_dense: jax.Array, labels_dense: jax.Array) -> dict:
    """Positive/negative similarity statistics for dense contrastive logits.

    Mirrors reference ``calcuate_dense_loss_stats`` (correlation_mapping.py:11-53):
    positive scores are the logits where the label is set, negatives the
    complement; statistics are NaN-masked means and quartiles with linear
    interpolation, matching torch ``nanmean``/``nanquantile``.

    TPU cost note: the reference formulation (two ``nanquantile`` calls on
    NaN-masked copies) pays TWO bitonic sorts of the (B, X·Y) tensor plus two
    ``nanmean`` passes.  Since the positives and negatives partition the same
    tensor, one lexicographic sort with key (label, logit) orders the row as
    [negatives ascending | positives ascending]; both groups' exact quartiles
    are then 6 gathers per row, and the means are masked sums.  Identical
    results (pinned by tests/test_contrastive_metrics.py and the grouped-
    equivalence test), half the sort cost — this is what makes every-step
    scalar logging affordable (see --scalar-freq in train/pretrain.py).
    """
    if logits_dense.shape != labels_dense.shape:
        raise ValueError(f"{logits_dense.shape=} != {labels_dense.shape=}")
    b = logits_dense.shape[0]
    labels = labels_dense.reshape(b, -1).astype(bool)
    logits = jax.lax.stop_gradient(
        logits_dense.reshape(b, -1).astype(jnp.float32)
    )
    s = logits.shape[1]

    lab_f = labels.astype(jnp.float32)
    n_pos = jnp.sum(lab_f, axis=1)  # (B,)
    n_neg = s - n_pos
    sum_all = jnp.sum(logits, axis=1)
    sum_pos = jnp.sum(logits * lab_f, axis=1)
    nan = jnp.float32(jnp.nan)
    mean_pos = jnp.where(n_pos > 0, sum_pos / jnp.maximum(n_pos, 1.0), nan)
    mean_neg = jnp.where(
        n_neg > 0, (sum_all - sum_pos) / jnp.maximum(n_neg, 1.0), nan
    )

    # one sort, negatives-then-positives, each ascending; is_stable=False
    # because equal (label, logit) pairs are interchangeable for segment
    # quartiles and the TPU stable-sort lowering adds an s32 iota operand
    # (a third array through the whole sort)
    _, sorted_vals = jax.lax.sort(
        (labels.astype(jnp.int32), logits), num_keys=2, dimension=1,
        is_stable=False,
    )
    neg_q = _segment_quartiles(sorted_vals, jnp.zeros_like(n_neg), n_neg)
    pos_q = _segment_quartiles(sorted_vals, n_neg, n_pos)
    return {
        "positive": {"quartiles": pos_q, "average": mean_pos},
        "negative": {"quartiles": neg_q, "average": mean_neg},
    }
