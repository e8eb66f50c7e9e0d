"""Segmentation loss zoo: CE/Dice/Lovász/OHEM/accuracy semantics."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cp2_tpu.ops.seg_losses import (
    cross_entropy_loss,
    dice_loss,
    lovasz_softmax_loss,
    ohem_weights,
    seg_accuracy,
)


def _logits_for(labels, num_classes=3, confidence=10.0):
    return confidence * jax.nn.one_hot(labels, num_classes)


def test_cross_entropy_ignore_index():
    labels = jnp.array([[[0, 1], [2, 255]]])
    logits = _logits_for(jnp.where(labels == 255, 0, labels))
    loss = cross_entropy_loss(logits, labels, ignore_index=255)
    assert float(loss) < 0.01  # perfect predictions on valid pixels
    # wrong prediction on an ignored pixel changes nothing
    logits2 = logits.at[0, 1, 1].set(jnp.array([0.0, 10.0, 0.0]))
    np.testing.assert_allclose(
        float(cross_entropy_loss(logits2, labels, ignore_index=255)),
        float(loss), rtol=1e-6,
    )


def test_dice_loss_perfect_vs_wrong():
    labels = jnp.array([[[0, 1], [1, 0]]])
    perfect = dice_loss(_logits_for(labels, 2), labels, ignore_index=None)
    wrong = dice_loss(_logits_for(1 - labels, 2), labels, ignore_index=None)
    assert float(perfect) < 0.1
    # with smooth=1 on a 4-pixel map the worst case tops out at ~0.8
    assert float(wrong) > 0.75


def test_lovasz_perfect_prediction_near_zero():
    labels = jnp.array([[[0, 1], [2, 1]]])
    loss = lovasz_softmax_loss(_logits_for(labels, 3, 100.0), labels,
                               ignore_index=None)
    assert float(loss) < 1e-3
    wrong = lovasz_softmax_loss(
        _logits_for((labels + 1) % 3, 3, 100.0), labels, ignore_index=None
    )
    assert float(wrong) > 0.5


def test_ohem_keeps_hard_pixels():
    # 8 pixels; 4 confidently correct, 4 confidently wrong (hard)
    labels = jnp.array([[[0, 0, 0, 0], [1, 1, 1, 1]]])
    logits = jnp.zeros((1, 2, 4, 2))
    logits = logits.at[0, 0].set(jnp.array([10.0, -10.0]))  # correct for class 0
    logits = logits.at[0, 1].set(jnp.array([10.0, -10.0]))  # wrong for class 1
    w = ohem_weights(logits, labels, thresh=0.5, min_kept=2, ignore_index=None)
    # all 4 hard pixels kept (conf < thresh), easy ones dropped
    np.testing.assert_array_equal(np.asarray(w[0, 1]), np.ones(4))
    np.testing.assert_array_equal(np.asarray(w[0, 0]), np.zeros(4))


def test_seg_accuracy_with_ignore():
    labels = jnp.array([[[0, 1], [255, 1]]])
    logits = _logits_for(jnp.where(labels == 255, 1, labels), 2)
    acc = seg_accuracy(logits, labels, ignore_index=255)
    np.testing.assert_allclose(float(acc), 100.0)
