"""Segmentation loss zoo: CE, Dice, Lovász, OHEM sampling, accuracy.

Parity with the reference's mmseg loss modules
(``mmseg_/models/losses/``: cross_entropy_loss.py, dice_loss.py,
lovasz_loss.py, accuracy.py, utils.py) and the OHEM pixel sampler
(``mmseg_/core/seg/sampler/ohem_pixel_sampler.py:9-76``), as pure
fixed-shape functions registered in the LOSSES registry.

All take NHWC logits and (N, H, W) integer labels; ``ignore_index``
pixels contribute zero weight.  OHEM is expressed as a weight mask (no
dynamic shapes): the k-th smallest kept confidence becomes a threshold.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from cp2_tpu.models.registry import LOSSES


def _valid_mask(labels, ignore_index):
    if ignore_index is None:
        return jnp.ones_like(labels, jnp.float32)
    return (labels != ignore_index).astype(jnp.float32)


def _pick_label_channel(values, labels):
    """``values[..., labels]`` per pixel as a fused compare-select-reduce.

    ``jnp.take_along_axis`` lowers to a serial per-pixel gather on TPU
    (measured 28% of the finetune step at 352²); the broadcast-compare form
    fuses into a single vectorized reduction over the class axis.
    """
    classes = jnp.arange(values.shape[-1], dtype=labels.dtype)
    return jnp.sum(
        jnp.where(labels[..., None] == classes, values, 0.0), axis=-1
    )


@LOSSES.register(name="CrossEntropyLoss")
def cross_entropy_loss(
    logits,
    labels,
    *,
    weight: Optional[jax.Array] = None,
    ignore_index: Optional[int] = 255,
    use_sigmoid: bool = False,
    loss_weight: float = 1.0,
    class_weight: Optional[jax.Array] = None,
):
    """Pixelwise CE (or BCE when ``use_sigmoid``) with ignore handling."""
    valid = _valid_mask(labels, ignore_index)
    safe_labels = jnp.where(valid > 0, labels, 0)
    if use_sigmoid:
        onehot = jax.nn.one_hot(safe_labels, logits.shape[-1])
        per_class = optax_sigmoid_bce(logits, onehot)
        per_pixel = per_class.mean(-1)
    else:
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        per_pixel = -_pick_label_channel(log_probs, safe_labels)
        if class_weight is not None:
            classes = jnp.arange(class_weight.shape[0], dtype=safe_labels.dtype)
            per_pixel = per_pixel * jnp.sum(
                jnp.where(safe_labels[..., None] == classes, class_weight, 0.0),
                axis=-1,
            )
    if weight is not None:
        per_pixel = per_pixel * weight
    return loss_weight * jnp.sum(per_pixel * valid) / jnp.maximum(valid.sum(), 1.0)


def optax_sigmoid_bce(logits, targets):
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    return -targets * log_p - (1.0 - targets) * log_not_p


@LOSSES.register(name="DiceLoss")
def dice_loss(
    logits,
    labels,
    *,
    smooth: float = 1.0,
    exponent: float = 2.0,
    ignore_index: Optional[int] = 255,
    loss_weight: float = 1.0,
    class_weight: Optional[jax.Array] = None,
):
    """Multi-class soft Dice (mmseg dice_loss.py semantics)."""
    num_classes = logits.shape[-1]
    valid = _valid_mask(labels, ignore_index)
    probs = jax.nn.softmax(logits, axis=-1) * valid[..., None]
    onehot = jax.nn.one_hot(jnp.where(valid > 0, labels, 0), num_classes)
    onehot = onehot * valid[..., None]
    dims = tuple(range(labels.ndim))  # reduce over batch+spatial
    num = 2.0 * jnp.sum(probs * onehot, axis=dims) + smooth
    den = (
        jnp.sum(probs**exponent, axis=dims)
        + jnp.sum(onehot**exponent, axis=dims)
        + smooth
    )
    per_class = 1.0 - num / den
    if class_weight is not None:
        per_class = per_class * class_weight
    return loss_weight * per_class.mean()


def _lovasz_grad(gt_sorted):
    """Gradient of the Lovász extension w.r.t. sorted errors."""
    gts = gt_sorted.sum()
    intersection = gts - jnp.cumsum(gt_sorted)
    union = gts + jnp.cumsum(1.0 - gt_sorted)
    jaccard = 1.0 - intersection / jnp.maximum(union, 1e-12)
    return jnp.concatenate([jaccard[:1], jaccard[1:] - jaccard[:-1]])


@LOSSES.register(name="LovaszLoss")
def lovasz_softmax_loss(
    logits,
    labels,
    *,
    ignore_index: Optional[int] = 255,
    loss_weight: float = 1.0,
    classes: str = "present",
):
    """Lovász-Softmax (mmseg lovasz_loss.py), flattened over the batch.

    ``classes='present'`` weights a class only when it appears, realized
    as a presence mask (fixed shapes).
    """
    num_classes = logits.shape[-1]
    valid = _valid_mask(labels, ignore_index).reshape(-1)
    probs = jax.nn.softmax(logits, axis=-1).reshape(-1, num_classes)
    labels_flat = jnp.where(valid > 0, labels.reshape(-1), 0)

    def class_loss(c):
        fg = ((labels_flat == c) & (valid > 0)).astype(jnp.float32)
        errors = jnp.abs(fg - probs[:, c]) * valid
        # key-value sort instead of argsort + two P-sized gathers; the
        # Lovász sum is invariant to tie order within equal-error blocks
        # (the tied block contributes err·(J[end]−J[start−1])), matching
        # torch.sort's unspecified tie behavior in the reference
        neg_err_sorted, fg_sorted = jax.lax.sort(
            (-errors, fg), num_keys=1, dimension=0, is_stable=False
        )
        errors_sorted = -neg_err_sorted
        grad = _lovasz_grad(fg_sorted)
        loss_c = jnp.sum(errors_sorted * grad)
        present = fg.sum() > 0
        return loss_c, present.astype(jnp.float32)

    losses, present = jax.vmap(class_loss)(jnp.arange(num_classes))
    if classes == "present":
        return loss_weight * jnp.sum(losses * present) / jnp.maximum(present.sum(), 1.0)
    return loss_weight * losses.mean()


def ohem_weights(
    logits,
    labels,
    *,
    thresh: Optional[float] = None,
    min_kept: int = 100000,
    ignore_index: Optional[int] = 255,
):
    """Online-hard-example pixel weights (OHEMPixelSampler semantics).

    Keeps pixels whose true-class probability is below ``thresh`` but at
    least ``min_kept`` per batch (by taking the min_kept-th smallest
    confidence as the effective threshold).  Returns a {0,1} weight map —
    multiply into any pixel loss.
    """
    valid = _valid_mask(labels, ignore_index)
    probs = jax.nn.softmax(logits, axis=-1)
    safe_labels = jnp.where(valid > 0, labels, 0)
    conf = _pick_label_channel(probs, safe_labels)
    conf = jnp.where(valid > 0, conf, jnp.inf)
    flat = jax.lax.sort(conf.reshape(-1), dimension=0, is_stable=False)
    k = jnp.minimum(min_kept, flat.shape[0]) - 1
    kth = flat[jnp.maximum(k, 0)]
    eff_thresh = kth if thresh is None else jnp.maximum(kth, thresh)
    return ((conf <= eff_thresh) & (valid > 0)).astype(jnp.float32)


def seg_accuracy(logits, labels, *, topk=(1,), ignore_index: Optional[int] = 255):
    """Pixel top-k accuracy in percent (mmseg accuracy.py).

    Sort-free stable-rank query (see ops/losses.py::topk_accuracy): the
    label's descending rank is #strictly-greater + #equal-at-lower-channel,
    identical to stable argsort membership without the per-pixel
    (num_classes) sort + gather. Ignored pixels (label outside the channel
    range) yield an arbitrary rank, zeroed by ``valid`` exactly as the
    argsort form's never-matching comparison was.
    """
    valid = _valid_mask(labels, ignore_index)
    cols = jnp.arange(logits.shape[-1])
    is_label = cols == labels[..., None]
    score = jnp.sum(jnp.where(is_label, logits, 0), axis=-1, keepdims=True)
    rank = jnp.sum(
        (logits > score) | ((logits == score) & (cols < labels[..., None])),
        axis=-1,
    )
    out = []
    for k in topk:
        hit = (rank < k).astype(jnp.float32)
        out.append(100.0 * jnp.sum(hit * valid) / jnp.maximum(valid.sum(), 1.0))
    return out[0] if len(out) == 1 else out
