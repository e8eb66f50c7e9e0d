"""Pin the tensor-axis semantics of the dense contrastive statistics.

Mirrors the reference's hand-computed expectations
(tests/test_contrastive_metrics.py:16-57) and extends them to the
NaN-masked positive/negative split used at train time.
"""

import numpy as np
import jax.numpy as jnp

from cp2_tpu.ops import dense_loss_stats


def test_mean_and_quantile_axis_semantics():
    scores = jnp.array(
        [
            [[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]],
            [[1.0, 2.0, 3.0], [7.0, 8.0, 9.0]],
        ]
    )
    np.testing.assert_allclose(
        np.asarray(scores.mean(axis=2)), [[2.0, 5.0], [2.0, 8.0]]
    )
    np.testing.assert_allclose(np.asarray(scores.mean(axis=(1, 2))), [3.5, 5.0])

    flat = scores.reshape(scores.shape[0], -1)
    quartiles = jnp.quantile(flat, jnp.array([0.25, 0.5, 0.75]), axis=1)
    np.testing.assert_allclose(
        np.asarray(quartiles),
        [[2.25, 2.25], [3.5, 5.0], [4.75, 7.75]],
    )


def test_dense_loss_stats_nan_masking():
    logits = jnp.array([[[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]]])
    labels = jnp.array([[[1.0, 0.0, 0.0], [0.0, 0.0, 1.0]]])
    stats = dense_loss_stats(logits, labels)

    # positives: {1, 6}; negatives: {2, 3, 4, 5}
    np.testing.assert_allclose(np.asarray(stats["positive"]["average"]), [3.5])
    np.testing.assert_allclose(np.asarray(stats["negative"]["average"]), [3.5])
    np.testing.assert_allclose(np.asarray(stats["positive"]["quartiles"][1]), [3.5])
    np.testing.assert_allclose(np.asarray(stats["negative"]["quartiles"][0]), [2.75])
    np.testing.assert_allclose(np.asarray(stats["negative"]["quartiles"][2]), [4.25])


def test_dense_loss_stats_matches_reference_shapes():
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(4, 196, 196).astype(np.float32))
    labels = jnp.asarray((rng.rand(4, 196, 196) > 0.7).astype(np.float32))
    stats = dense_loss_stats(logits, labels)
    for side in ("positive", "negative"):
        assert stats[side]["average"].shape == (4,)
        for q in stats[side]["quartiles"]:
            assert q.shape == (4,)
    # cross-check one entry against numpy nan-quantile
    ref = np.where(np.asarray(labels, bool), np.asarray(logits), np.nan)
    np.testing.assert_allclose(
        np.asarray(stats["positive"]["quartiles"][1]),
        np.nanquantile(ref.reshape(4, -1), 0.5, axis=1),
        rtol=1e-5,
    )
