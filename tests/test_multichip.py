"""Multi-device semantics: sharded step == single-device step.

The replicated-queue/global-batch design claims the mesh layout changes
nothing numerically: one step on an 8-device data mesh must produce the
same result as the same batch on one device.  This is the property that
makes the reference's concat_all_gather/shuffle-BN machinery unnecessary
(PARITY.md deviations #1).

Chaos caveat — this property is tested in three parts, because it cannot
be tested naively in one.  Train-mode BatchNorm reduces batch statistics
with a device-dependent reduction order, giving ~1e-6 forward noise; the
gradient field of a random-init deep net is chaotically sensitive (a 1e-6
input perturbation moves single-device gradients by ~0.5 abs — measured),
so raw post-step parameter comparison across layouts is meaningless at f32
FOR ANY IMPLEMENTATION.  The decomposition:

1. ``test_sharded_step_exact_with_groupnorm`` — the FULL train step
   (augment-free forward/backward, EMA, optimizer, queue) with per-sample
   GroupNorm: the only cross-sample reductions left are the loss mean and
   the gradient sum, so sharded and single-device must agree to float
   noise WITHOUT chaotic amplification.  This proves the parallelism
   machinery itself is exact.
2. ``test_sharded_bn_is_global_batch`` — train-mode BN under sharding
   produces global-batch statistics (SyncBN semantics), checked at
   one-layer scale where reduction noise is not amplified.
3. ``test_sharded_step_matches_single_device`` — the real BN model,
   checking the quantities that are NOT chaos-amplified: loss, key
   embeddings/queue, queue pointer.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import flax.linen as nn

from cp2_tpu.parallel import create_mesh, shard_batch, shard_pytree
from cp2_tpu.ssl import SSLEncoder, SSLHyperParams, create_pretrain_state
from cp2_tpu.ssl.model import output_stride_of
from cp2_tpu.ssl.train_step import (
    backbone_output_stride_of,
    make_optimizer,
    make_pretrain_step,
)
from cp2_tpu.types import BackboneType, PretrainType

from tests.test_ssl_step import TINY_MODEL, _tiny_batch, BATCH, DIM


def _require_mesh():
    # conftest guarantees (and asserts) the 8-device CPU backend; a missing
    # mesh must FAIL these gate tests, never skip them (round-1 failure mode).
    assert jax.device_count() >= 8, "conftest failed to provide the 8-device mesh"


def _gn_model():
    """TINY_MODEL with per-sample GroupNorm everywhere (chaos-free layout)."""
    import copy

    cfg = copy.deepcopy(TINY_MODEL)
    cfg["backbone"]["norm_cfg"] = dict(type="GN", num_groups=4)
    cfg["decode_head"]["norm_cfg"] = dict(type="GN", num_groups=4)
    return cfg


def _run_both_layouts(model_cfg, queue_len=64):
    hp = SSLHyperParams.for_variant(PretrainType.CP2, dim=DIM, queue_len=queue_len)
    model = SSLEncoder(
        model_cfg=model_cfg, pretrain_type=PretrainType.CP2,
        backbone_type=BackboneType.DEEPLABV3, dim=DIM,
    )
    tx = make_optimizer("sgd", 0.05)
    batch = _tiny_batch(0)
    # BATCH=2 -> 8 rows so the batch splits over 8 devices
    batch = jax.tree_util.tree_map(
        lambda x: jnp.concatenate([x, x, x, x], 0), batch
    )
    state = create_pretrain_state(
        jax.random.PRNGKey(0), model, tx, hp, batch["img_a"],
        init_fn=lambda m, r, x: m.init(r, x, method="init_all"),
    )
    step = make_pretrain_step(
        model, tx, hp, output_stride_of(model_cfg),
        backbone_output_stride_of(model_cfg, BackboneType.DEEPLABV3),
        metrics_level=0,
    )
    rng = jax.random.PRNGKey(7)

    # single device (default placement)
    s1, m1 = jax.jit(step)(state, batch, rng)

    # 8-device data mesh
    mesh = create_mesh(8)
    with mesh:
        state8 = shard_pytree(state, mesh)
        batch8 = shard_batch(batch, mesh)
        s8, m8 = jax.jit(step)(state8, batch8, rng)
    return (s1, m1), (s8, m8)


@pytest.mark.slow
def test_sharded_step_exact_with_groupnorm():
    """Full step machinery is EXACT across layouts when no op mixes samples
    (GroupNorm model): loss, gradients->params, queue all agree to float
    reduction noise with no chaotic amplification channel."""
    _require_mesh()
    (s1, m1), (s8, m8) = _run_both_layouts(_gn_model())

    np.testing.assert_allclose(
        float(m1["loss"]), float(m8["loss"]), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(s1.queue), np.asarray(s8.queue), atol=1e-5
    )
    assert int(s1.queue_ptr) == int(s8.queue_ptr)
    for p1, p8 in zip(
        jax.tree_util.tree_leaves(s1.params), jax.tree_util.tree_leaves(s8.params)
    ):
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p8), atol=2e-5)
    for e1, e8 in zip(
        jax.tree_util.tree_leaves(s1.ema_params),
        jax.tree_util.tree_leaves(s8.ema_params),
    ):
        np.testing.assert_allclose(np.asarray(e1), np.asarray(e8), atol=2e-5)


def test_sharded_bn_is_global_batch():
    """Train-mode BN under a sharded batch normalises with GLOBAL batch
    statistics (the SyncBN semantics that replace reference shuffle-BN),
    not per-shard statistics."""
    _require_mesh()

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(16, (3, 3))(x)
            x = nn.BatchNorm(use_running_average=False)(x)
            return x

    net = Net()
    # deliberately non-iid across the batch so per-shard stats would differ
    # wildly from global stats
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 8, 8, 3))
    x = x * (1.0 + jnp.arange(8.0)[:, None, None, None])
    v = net.init(jax.random.PRNGKey(1), x)

    def fwd(v, x):
        y, mut = net.apply(v, x, mutable=["batch_stats"])
        return y, mut["batch_stats"]

    y1, bs1 = jax.jit(fwd)(v, x)
    mesh = create_mesh(8)
    with mesh:
        y8, bs8 = jax.jit(fwd)(shard_pytree(v, mesh), shard_batch(x, mesh))

    np.testing.assert_allclose(np.asarray(y1), np.asarray(y8), atol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(bs1), jax.tree_util.tree_leaves(bs8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.slow
def test_sharded_step_matches_single_device():
    """The real BN model: quantities without a chaotic amplification path
    (loss, key/queue, pointer) agree across layouts; params get a sanity
    bound only (see module docstring for why exact comparison is
    impossible at f32)."""
    _require_mesh()
    (s1, m1), (s8, m8) = _run_both_layouts(TINY_MODEL)

    # Loss: one fwd pass of BN reduction-order noise, no backprop chaos.
    np.testing.assert_allclose(
        float(m1["loss"]), float(m8["loss"]), rtol=5e-4, atol=5e-5
    )
    # Queue rows are L2-normalised key embeddings (forward-only).
    np.testing.assert_allclose(
        np.asarray(s1.queue), np.asarray(s8.queue), atol=2e-3
    )
    assert int(s1.queue_ptr) == int(s8.queue_ptr)
    # Params: chaos-amplified; assert structural sanity only (same step
    # taken, no divergence blow-up). Exactness is proven by the GN test.
    p1 = np.concatenate([np.asarray(l).ravel()
                         for l in jax.tree_util.tree_leaves(s1.params)])
    p8 = np.concatenate([np.asarray(l).ravel()
                         for l in jax.tree_util.tree_leaves(s8.params)])
    denom = np.linalg.norm(p1)
    assert np.linalg.norm(p1 - p8) / denom < 5e-2
