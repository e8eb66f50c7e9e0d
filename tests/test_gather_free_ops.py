"""Equivalence pins for the gather-free hot-op rewrites.

TPU lowers per-element gathers/scatter-adds to ~serial loops (measured
70.6% of the finetune step — BASELINE.md), so the CE label pick, the
confusion/intersection histograms, and the GridDistortion mask warp use
fused compare-select-reduce / one-hot-matmul forms instead.  These tests
pin each rewrite to its naive formulation on random data so the fast
paths can never drift semantically.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cp2_tpu.ops.losses import softmax_cross_entropy
from cp2_tpu.ops.metrics import ConfusionState, intersect_and_union
from cp2_tpu.ops.seg_losses import _pick_label_channel


@pytest.mark.parametrize("num_classes", [2, 12, 19])
def test_confusion_update_matches_bincount(num_classes):
    r = np.random.RandomState(num_classes)
    preds = r.randint(0, num_classes, size=(5, 17, 13))
    targets = r.randint(0, num_classes, size=(5, 17, 13))
    got = ConfusionState.create(num_classes).update(
        jnp.asarray(preds), jnp.asarray(targets)
    )
    idx = targets.reshape(-1) * num_classes + preds.reshape(-1)
    want = np.bincount(idx, minlength=num_classes * num_classes).reshape(
        num_classes, num_classes
    )
    np.testing.assert_array_equal(np.asarray(got.matrix), want)


def test_confusion_update_sample_mask_matches_weighted_bincount():
    num_classes = 3
    r = np.random.RandomState(0)
    preds = r.randint(0, num_classes, size=(6, 9, 9))
    targets = r.randint(0, num_classes, size=(6, 9, 9))
    mask = np.array([1, 1, 0, 1, 0, 1], bool)
    got = ConfusionState.create(num_classes).update(
        jnp.asarray(preds), jnp.asarray(targets), jnp.asarray(mask)
    )
    idx = (targets.reshape(-1) * num_classes + preds.reshape(-1))
    w = np.repeat(mask.astype(np.float32), 9 * 9)
    want = np.bincount(idx, weights=w,
                       minlength=num_classes * num_classes).reshape(
        num_classes, num_classes
    )
    np.testing.assert_allclose(np.asarray(got.matrix), want)


def test_pick_label_channel_matches_take_along_axis():
    r = np.random.RandomState(1)
    vals = r.randn(4, 7, 7, 21).astype(np.float32)
    labels = r.randint(0, 21, size=(4, 7, 7))
    got = _pick_label_channel(jnp.asarray(vals), jnp.asarray(labels))
    want = np.take_along_axis(vals, labels[..., None], axis=-1)[..., 0]
    np.testing.assert_allclose(np.asarray(got), want, rtol=0, atol=0)


def test_softmax_ce_matches_naive_with_ignore():
    r = np.random.RandomState(2)
    logits = r.randn(3, 8, 8, 5).astype(np.float32)
    labels = r.randint(0, 5, size=(3, 8, 8))
    labels[0, :2, :3] = 255  # ignored region
    got = float(softmax_cross_entropy(
        jnp.asarray(logits), jnp.asarray(labels), ignore_index=255
    ))
    lp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    lp = np.asarray(lp)
    valid = labels != 255
    picked = np.take_along_axis(
        lp, np.where(valid, labels, 0)[..., None], axis=-1
    )[..., 0]
    want = -(picked * valid).sum() / valid.sum()
    np.testing.assert_allclose(got, want, rtol=1e-6)


@pytest.mark.parametrize("num_classes", [2, 19, 150])
def test_intersect_and_union_matches_numpy(num_classes):
    r = np.random.RandomState(num_classes)
    pred = r.randint(0, num_classes, size=(31, 33))
    label = r.randint(0, num_classes, size=(31, 33))
    label[:3, :5] = 255
    ai, au, ap, al = intersect_and_union(
        jnp.asarray(pred), jnp.asarray(label), num_classes, ignore_index=255
    )
    valid = label != 255
    want_ai = np.bincount(pred[valid & (pred == label)],
                          minlength=num_classes)[:num_classes]
    want_ap = np.bincount(pred[valid], minlength=num_classes)[:num_classes]
    want_al = np.bincount(label[valid], minlength=num_classes)[:num_classes]
    np.testing.assert_array_equal(np.asarray(ai), want_ai)
    np.testing.assert_array_equal(np.asarray(ap), want_ap)
    np.testing.assert_array_equal(np.asarray(al), want_al)
    np.testing.assert_array_equal(np.asarray(au), want_ap + want_al - want_ai)


def test_topk_accuracy_matches_stable_argsort():
    """The sort-free rank form must reproduce stable-argsort top-k
    membership exactly — including ties with the label's score on both
    sides of its column index (the InfoNCE label is always column 0, but
    the op is general)."""
    from cp2_tpu.ops.losses import topk_accuracy

    r = np.random.RandomState(7)
    # quantized values force many exact ties
    logits = r.randint(0, 9, size=(64, 37)).astype(np.float32) / 8.0
    labels = r.randint(0, 37, size=(64,))
    got = topk_accuracy(jnp.asarray(logits), jnp.asarray(labels), ks=(1, 3, 5))
    order = np.argsort(-logits, axis=1, kind="stable")
    for g, k in zip(got, (1, 3, 5)):
        want = 100.0 * np.mean(
            (order[:, :k] == labels[:, None]).any(axis=1)
        )
        np.testing.assert_allclose(float(g), want, rtol=0, atol=1e-5)


def test_row_quantiles_linear_matches_jnp_quantile():
    from cp2_tpu.ops.losses import row_quantiles_linear

    r = np.random.RandomState(3)
    for n, k in ((4, 11), (3, 65536), (2, 2), (5, 1)):
        x = r.randn(n, k).astype(np.float32)
        got = row_quantiles_linear(jnp.asarray(x), (0.25, 0.5, 0.75))
        want = np.quantile(x, [0.25, 0.5, 0.75], axis=1)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6, atol=1e-6)


def test_hard_negative_quantile_matches_nanquantile():
    """The segment-sort 75th percentile inside negative_reshape('HARD')
    must match the nanquantile formulation it replaced."""
    from cp2_tpu.ops.losses import negative_reshape

    r = np.random.RandomState(11)
    logits = r.randn(3, 14, 14).astype(np.float32)
    labels = (r.rand(3, 14, 14) > 0.7).astype(np.float32)
    got = negative_reshape(
        jnp.asarray(logits), jnp.asarray(labels), "HARD", 1.0
    )
    negs = np.where(labels == 0, logits, np.nan)
    q75 = np.nanquantile(negs, 0.75)
    hard = (labels == 0) & (logits > q75)
    want = np.where(hard, logits * 1.5, logits)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6, atol=1e-6)
