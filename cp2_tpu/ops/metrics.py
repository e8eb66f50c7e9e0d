"""Segmentation metrics as on-device confusion accumulators.

TPU-native replacement for two metric stacks in the reference:

* the torchmetrics ``MetricCollection`` (Jaccard/Dice/Precision/Recall/F1)
  the finetune module keeps per stage (reference
  ``networks/segment_network.py:179-217``) — here a pure
  ``ConfusionState`` pytree updated inside the jitted step; cross-replica
  reduction is a single psum of the (C, C) counts, replacing torchmetrics'
  ``sync_dist`` gather.
* mmseg's ``intersect_and_union`` / ``eval_metrics``
  (``mmseg_/core/evaluation/metrics.py:25-311``) — ``intersect_and_union``
  and ``eval_metrics`` below reproduce the per-class IoU / Dice / Fscore
  tables.

Semantics notes (binary task, matching torchmetrics as configured by the
reference): class 1 is the positive class; ``Dice(average='micro',
ignore_index=0)`` over two classes reduces to the positive-class F1, and
``BinaryJaccardIndex`` to TP/(TP+FP+FN).  For multiclass the reference
ignores the background class; micro stats here likewise exclude target
pixels equal to ``ignore_index`` and drop the ignored class's diagonal.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from flax.struct import dataclass as flax_dataclass


@flax_dataclass
class ConfusionState:
    """(C, C) confusion counts; rows = target class, cols = predicted."""

    matrix: jax.Array  # (C, C) float32

    @classmethod
    def create(cls, num_classes: int) -> "ConfusionState":
        return cls(matrix=jnp.zeros((num_classes, num_classes), jnp.float32))

    def update(
        self,
        preds: jax.Array,
        targets: jax.Array,
        sample_mask: Optional[jax.Array] = None,
    ) -> "ConfusionState":
        """Accumulate from integer prediction/target maps of equal shape.

        ``sample_mask`` (N,) bool excludes padded rows (loaders pad the
        final drop_last=False batch by repeating the last sample; counting
        those duplicates would bias val/test IoU).
        """
        num_classes = self.matrix.shape[0]
        idx = targets.reshape(-1) * num_classes + preds.reshape(-1)
        w = None
        if sample_mask is not None:
            w = jnp.broadcast_to(
                sample_mask.reshape((-1,) + (1,) * (preds.ndim - 1)),
                preds.shape,
            ).reshape(-1).astype(jnp.float32)
        bins = num_classes * num_classes
        if bins <= 256:
            # fused compare-select-reduce histogram: bincount lowers to a
            # serial scatter-add on TPU (measured 17% of the finetune step
            # at 352^2); the (P, bins) compare never materializes — XLA
            # folds it into the column reduction
            hit = idx[:, None] == jnp.arange(bins, dtype=idx.dtype)
            contrib = hit.astype(jnp.float32) if w is None else \
                jnp.where(hit, w[:, None], 0.0)
            counts = jnp.sum(contrib, axis=0)
        elif w is None:
            counts = jnp.bincount(idx, length=bins)
        else:
            counts = jnp.bincount(idx, weights=w, length=bins)
        return ConfusionState(
            matrix=self.matrix + counts.reshape(num_classes, num_classes)
        )

    def merge(self, other: "ConfusionState") -> "ConfusionState":
        return ConfusionState(matrix=self.matrix + other.matrix)


def _binary_stats(cm: jax.Array):
    tp = cm[1, 1]
    fp = cm[0, 1]
    fn = cm[1, 0]
    tn = cm[0, 0]
    return tp, fp, fn, tn


def compute_metrics(
    state: ConfusionState,
    *,
    binary: bool = True,
    ignore_index: Optional[int] = None,
    prefix: str = "",
) -> Dict[str, jax.Array]:
    """JaccardIndex / Dice / Precision / Recall / F1Score from the counts.

    Metric names mirror the reference's logged keys (e.g.
    ``val_BinaryJaccardIndex``, segment_network.py:179-217) so downstream
    tooling and checkpoint selection are drop-in compatible.
    """
    cm = state.matrix
    eps = 1e-12
    out: Dict[str, jax.Array] = {}
    if binary:
        tp, fp, fn, _ = _binary_stats(cm)
        precision = tp / jnp.maximum(tp + fp, eps)
        recall = tp / jnp.maximum(tp + fn, eps)
        f1 = 2 * tp / jnp.maximum(2 * tp + fp + fn, eps)
        out[f"{prefix}BinaryJaccardIndex"] = tp / jnp.maximum(tp + fp + fn, eps)
        out[f"{prefix}Dice"] = f1
        out[f"{prefix}BinaryPrecision"] = precision
        out[f"{prefix}BinaryRecall"] = recall
        out[f"{prefix}BinaryF1Score"] = f1
        return out

    num_classes = cm.shape[0]
    keep = jnp.ones((num_classes,), bool)
    if ignore_index is not None:
        keep = keep.at[ignore_index].set(False)
    diag = jnp.diagonal(cm)
    tp = jnp.sum(jnp.where(keep, diag, 0.0))
    # predictions of kept classes that miss, and targets of kept classes missed
    pred_per_class = cm.sum(axis=0)
    target_per_class = cm.sum(axis=1)
    fp = jnp.sum(jnp.where(keep, pred_per_class - diag, 0.0))
    fn = jnp.sum(jnp.where(keep, target_per_class - diag, 0.0))
    precision = tp / jnp.maximum(tp + fp, eps)
    recall = tp / jnp.maximum(tp + fn, eps)
    f1 = 2 * tp / jnp.maximum(2 * tp + fp + fn, eps)
    out[f"{prefix}MulticlassJaccardIndex"] = tp / jnp.maximum(tp + fp + fn, eps)
    out[f"{prefix}Dice"] = f1
    out[f"{prefix}MulticlassPrecision"] = precision
    out[f"{prefix}MulticlassRecall"] = recall
    out[f"{prefix}MulticlassF1Score"] = f1
    return out


def intersect_and_union(
    pred: jax.Array,
    label: jax.Array,
    num_classes: int,
    ignore_index: Optional[int] = None,
):
    """Per-class intersection/union histograms (mmseg metrics.py:25-85)."""
    if ignore_index is not None:
        valid = label != ignore_index
    else:
        valid = jnp.ones_like(label, bool)
    pred = pred.reshape(-1)
    label = label.reshape(-1)
    valid = valid.reshape(-1)

    def hist(x, mask):
        if num_classes <= 256:
            # fused compare-reduce histogram (see ConfusionState.update)
            hit = x[:, None] == jnp.arange(num_classes, dtype=x.dtype)
            return jnp.sum(hit & mask[:, None], axis=0)
        return jnp.bincount(jnp.where(mask, x, num_classes), length=num_classes + 1)[
            :num_classes
        ]

    area_intersect = hist(pred, valid & (pred == label))
    area_pred = hist(pred, valid)
    area_label = hist(label, valid)
    area_union = area_pred + area_label - area_intersect
    return area_intersect, area_union, area_pred, area_label


def eval_metrics(
    total_intersect: jax.Array,
    total_union: jax.Array,
    total_pred: jax.Array,
    total_label: jax.Array,
    metrics=("mIoU",),
    beta: float = 1.0,
) -> Dict[str, jax.Array]:
    """Aggregate per-class IoU / Dice / Fscore (mmseg metrics.py:133-311)."""
    eps = 1e-12
    out: Dict[str, jax.Array] = {
        "aAcc": total_intersect.sum() / jnp.maximum(total_label.sum(), eps)
    }
    acc = total_intersect / jnp.maximum(total_label, eps)
    if "mIoU" in metrics:
        iou = total_intersect / jnp.maximum(total_union, eps)
        out["IoU"] = iou
        out["Acc"] = acc
        out["mIoU"] = iou.mean()
    if "mDice" in metrics:
        dice = 2 * total_intersect / jnp.maximum(total_pred + total_label, eps)
        out["Dice"] = dice
        out["Acc"] = acc
        out["mDice"] = dice.mean()
    if "mFscore" in metrics:
        precision = total_intersect / jnp.maximum(total_pred, eps)
        recall = total_intersect / jnp.maximum(total_label, eps)
        fscore = (1 + beta**2) * precision * recall / jnp.maximum(
            beta**2 * precision + recall, eps
        )
        out["Fscore"] = fscore
        out["Precision"] = precision
        out["Recall"] = recall
        out["mFscore"] = fscore.mean()
    return out
