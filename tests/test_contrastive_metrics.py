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


def test_dense_loss_stats_single_sort_matches_nanquantile_oracle():
    """The grouped single-sort formulation equals the NaN-masked reference.

    ``dense_loss_stats`` computes both groups' quartiles from ONE
    lexicographic sort (TPU cost note in ops/correlation.py); the oracle is
    the reference formulation — two ``nanquantile``/``nanmean`` passes over
    NaN-masked copies (reference correlation_mapping.py:11-53).  Sweeps the
    label density through the degenerate all-positive / all-negative rows.
    """
    from cp2_tpu.ops.correlation import _nan_stats

    rng = np.random.RandomState(7)
    for density in (0.0, 0.03, 0.5, 0.97, 1.0):
        logits = jnp.asarray(rng.randn(5, 13, 17).astype(np.float32))
        labels = jnp.asarray((rng.rand(5, 13, 17) < density).astype(np.float32))
        got = dense_loss_stats(logits, labels)
        nan = jnp.float32(jnp.nan)
        lb = labels.astype(bool)
        want = {
            "positive": _nan_stats(jnp.where(lb, logits, nan)),
            "negative": _nan_stats(jnp.where(lb, nan, logits)),
        }
        for side in ("positive", "negative"):
            for i in range(3):
                np.testing.assert_allclose(
                    np.asarray(got[side]["quartiles"][i]),
                    np.asarray(want[side]["quartiles"][i]),
                    atol=1e-6, err_msg=f"{density=} {side} q{i}",
                )
            np.testing.assert_allclose(
                np.asarray(got[side]["average"]),
                np.asarray(want[side]["average"]),
                atol=1e-6, err_msg=f"{density=} {side} avg",
            )


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
