"""Multi-device semantics: sharded step == single-device step.

The replicated-queue/global-batch design claims the mesh layout changes
nothing numerically: one step on an 8-device data mesh must produce the
same loss and queue contents as the same batch on one device.  This is
the property that makes the reference's concat_all_gather/shuffle-BN
machinery unnecessary (PARITY.md deviations #1).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

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


@pytest.mark.slow
def test_sharded_step_matches_single_device():
    if jax.device_count() < 8:
        pytest.skip("needs the 8-device CPU mesh from conftest")
    hp = SSLHyperParams.for_variant(PretrainType.CP2, dim=DIM, queue_len=64)
    model = SSLEncoder(
        model_cfg=TINY_MODEL, pretrain_type=PretrainType.CP2,
        backbone_type=BackboneType.DEEPLABV3, dim=DIM,
    )
    tx = make_optimizer("sgd", 0.05)
    # batch must split over 8 devices
    batch = _tiny_batch(0)
    batch = jax.tree_util.tree_map(
        lambda x: jnp.concatenate([x] * (8 // BATCH * BATCH) if False else [x, x, x, x], 0),
        batch,
    )  # BATCH=2 -> 8 rows
    state = create_pretrain_state(
        jax.random.PRNGKey(0), model, tx, hp, batch["img_a"],
        init_fn=lambda m, r, x: m.init(r, x, method="init_all"),
    )
    step = make_pretrain_step(
        model, tx, hp, output_stride_of(TINY_MODEL),
        backbone_output_stride_of(TINY_MODEL, BackboneType.DEEPLABV3),
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

    np.testing.assert_allclose(
        float(m1["loss"]), float(m8["loss"]), rtol=2e-5, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(s1.queue), np.asarray(s8.queue), rtol=2e-4, atol=2e-5
    )
    assert int(s1.queue_ptr) == int(s8.queue_ptr)
    # params after one optimizer step agree
    p1 = jax.tree_util.tree_leaves(s1.params)[0]
    p8 = jax.tree_util.tree_leaves(s8.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p8), rtol=2e-4, atol=2e-5)
