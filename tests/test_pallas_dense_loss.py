"""Flash-style dense-loss kernel vs the naive XLA formulation.

Algebra is checked exactly with ``compute_dtype=float32``; the production
default (bfloat16 MXU operands) is checked against a loose tolerance —
on TPU the bf16 similarity error is O(1e-3) on unit-norm vectors.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cp2_tpu.ops.pallas.dense_loss import (
    dense_pair_loss,
    dense_pair_loss_reference,
)


def _inputs(n=2, s2=196, c=32, seed=0):
    r = np.random.RandomState(seed)
    q = r.randn(n, s2, c).astype(np.float32)
    k = r.randn(n, s2, c).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    k /= np.linalg.norm(k, axis=-1, keepdims=True)
    a = (r.rand(n, s2) > 0.5).astype(np.float32)
    b = (r.rand(n, s2) > 0.5).astype(np.float32)
    a[:, 0] = 1.0  # never fully empty
    b[:, 0] = 1.0
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(a), jnp.asarray(b)


@pytest.mark.slow
@pytest.mark.parametrize("temp", [1.0, 0.2])
def test_forward_matches_reference(temp):
    q, k, a, b = _inputs()
    ref = dense_pair_loss_reference(q, k, a, b, temp)
    out = dense_pair_loss(
        q, k, a, b, temp, interpret=True, compute_dtype=jnp.float32
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5)


@pytest.mark.slow
def test_forward_bf16_within_tolerance():
    q, k, a, b = _inputs(n=1, s2=128, c=16, seed=7)
    ref = dense_pair_loss_reference(q, k, a, b, 0.2)
    out = dense_pair_loss(q, k, a, b, 0.2, interpret=True)  # default bf16
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-2)


@pytest.mark.slow
def test_gradients_match_reference():
    q, k, a, b = _inputs(n=1, s2=128, c=16)

    ref_grads = jax.grad(
        lambda q, k: dense_pair_loss_reference(q, k, a, b, 0.5), argnums=(0, 1)
    )(q, k)
    our_grads = jax.grad(
        lambda q, k: dense_pair_loss(
            q, k, a, b, 0.5, interpret=True, compute_dtype=jnp.float32
        ),
        argnums=(0, 1),
    )(q, k)
    for ours, ref in zip(our_grads, ref_grads):
        np.testing.assert_allclose(
            np.asarray(ours), np.asarray(ref), rtol=1e-4, atol=1e-6
        )


@pytest.mark.slow
def test_nondivisible_key_length_padding():
    # S2 not a multiple of the 128-lane tile: padding must not change the loss
    q, k, a, b = _inputs(n=1, s2=100, c=8, seed=3)
    ref = dense_pair_loss_reference(q, k, a, b, 1.0)
    out = dense_pair_loss(
        q, k, a, b, 1.0, interpret=True, compute_dtype=jnp.float32
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5)


def test_large_s2_falls_back_to_xla():
    """Beyond the Mosaic VMEM envelope (S² > 2048) dense_pair_loss must
    transparently use the XLA formulation, value- and grad-intact."""
    q, k, a, b = _inputs(n=1, s2=2304, c=4, seed=9)
    ref = dense_pair_loss_reference(q, k, a, b, 0.5)
    out = dense_pair_loss(q, k, a, b, 0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)
    g = jax.grad(lambda q: dense_pair_loss(q, k, a, b, 0.5))(q)
    assert np.isfinite(np.asarray(g)).all()


def test_ragged_qk_rejected():
    q, k, a, b = _inputs(n=1, s2=128, c=8)
    with pytest.raises(ValueError, match="mismatch"):
        dense_pair_loss(q, k[:, :100], a, b, 1.0)


@pytest.mark.slow
def test_multitile_key_axis():
    # S2 > one key tile: exercises the 2-D (sample, key-tile) grid with
    # revisited accumulator blocks
    q, k, a, b = _inputs(n=1, s2=640, c=16, seed=5)
    ref = dense_pair_loss_reference(q, k, a, b, 0.5)
    out = dense_pair_loss(
        q, k, a, b, 0.5, interpret=True, compute_dtype=jnp.float32
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5)
    gref = jax.grad(
        lambda q, k: dense_pair_loss_reference(q, k, a, b, 0.5), argnums=(0, 1)
    )(q, k)
    gout = jax.grad(
        lambda q, k: dense_pair_loss(
            q, k, a, b, 0.5, interpret=True, compute_dtype=jnp.float32
        ),
        argnums=(0, 1),
    )(q, k)
    for ours, ref_g in zip(gout, gref):
        np.testing.assert_allclose(
            np.asarray(ours), np.asarray(ref_g), rtol=1e-4, atol=1e-6
        )
