"""SSL pretrain step smoke tests: every variant runs one jitted step.

Uses a tiny ResNet-18 segmentor so CPU compiles stay tractable; asserts
finite loss, queue pointer motion, EMA drift, and metric presence.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cp2_tpu.ssl import (
    SSLEncoder,
    SSLHyperParams,
    create_pretrain_state,
    output_stride_of,
)
from cp2_tpu.ssl.train_step import (
    backbone_output_stride_of,
    make_optimizer,
    make_pretrain_step,
)
from cp2_tpu.types import BackboneType, PretrainType

HW = 32
BATCH = 2
DIM = 16

TINY_MODEL = dict(
    type="EncoderDecoder",
    backbone=dict(
        type="ResNet",
        depth=18,
        stem_channels=8,
        base_channels=8,
        num_stages=4,
        out_indices=(0, 1, 2, 3),
        dilations=(1, 1, 1, 2),
        strides=(1, 2, 2, 1),
        norm_cfg=dict(type="BN"),
        contract_dilation=True,
    ),
    decode_head=dict(
        type="ASPPHead",
        in_channels=64,
        in_index=3,
        channels=16,
        contrast=True,
        contrast_dim=DIM,
        dilations=(1, 6),
        num_classes=2,
        norm_cfg=dict(type="BN"),
    ),
)


def _tiny_batch(rng):
    r = np.random.RandomState(rng)
    imgs = {
        k: jnp.asarray(r.rand(BATCH, HW, HW, 3).astype(np.float32))
        for k in ("img_a", "img_b")
    }
    # backgrounds with an erased (zeroed) central rectangle
    bg = r.rand(BATCH, HW, HW, 3).astype(np.float32)
    bg[:, 8:24, 8:24, :] = 0.0
    ids = np.arange(1, HW * HW + 1, dtype=np.int32).reshape(1, HW, HW)
    ids = np.repeat(ids, BATCH, axis=0)
    return {
        **imgs,
        "bg0": jnp.asarray(bg),
        "bg1": jnp.asarray(bg.copy()),
        "pixel_ids_a": jnp.asarray(ids),
        "pixel_ids_b": jnp.asarray(ids),
        "region_ids_a": jnp.asarray(ids),
        "region_ids_b": jnp.asarray(ids),
    }


def _make_everything(pretrain_type, **hp_overrides):
    # tiny backbone: final channels 64, so adjust neck/projector dims
    hp = SSLHyperParams.for_variant(
        pretrain_type, dim=DIM, queue_len=64, **hp_overrides
    )
    model = SSLEncoder(
        model_cfg=TINY_MODEL,
        pretrain_type=pretrain_type,
        backbone_type=BackboneType.DEEPLABV3,
        dim=DIM,
    )
    tx = make_optimizer("sgd", 0.05)
    batch = _tiny_batch(0)
    state = create_pretrain_state(
        jax.random.PRNGKey(0),
        model,
        tx,
        hp,
        batch["img_a"],
        init_fn=lambda m, r, x: m.init(r, x, method="init_all"),
    )
    os_ = output_stride_of(TINY_MODEL)
    bos = backbone_output_stride_of(TINY_MODEL, BackboneType.DEEPLABV3)
    step = make_pretrain_step(model, tx, hp, os_, bos, metrics_level=1)
    return model, state, jax.jit(step), batch


# the tiny neck/projector expect 2048-channel backbones in the real config;
# here the in_channels are inferred lazily by flax Dense/Conv so 64 works.

@pytest.mark.parametrize(
    "variant",
    [PretrainType.CP2, PretrainType.MOCO, PretrainType.BYOL, PretrainType.DENSECL],
    ids=lambda v: v.name,
)
@pytest.mark.slow
def test_pretrain_step_runs(variant):
    kwargs = {}
    if variant == PretrainType.DENSECL:
        kwargs = dict(
            momentum=0.999, lmbd_cp2_dense_loss=0.5,
            instance_logits_temp=0.2, dense_logits_temp=0.2,
        )
    model, state, step, batch = _make_everything(variant, **kwargs)
    rng = jax.random.PRNGKey(1)
    state1, metrics = step(state, batch, rng)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state1.step) == 1
    if variant != PretrainType.BYOL:
        assert int(state1.queue_ptr) == BATCH  # keys enqueued
    # EMA params moved toward online params after the update
    diff = jax.tree_util.tree_reduce(
        lambda acc, x: acc + float(jnp.abs(x).sum()),
        jax.tree_util.tree_map(
            lambda a, b: a - b, state1.params, state1.ema_params
        ),
        0.0,
    )
    assert diff > 0.0

    # second step reuses the compiled program and changes the loss
    state2, metrics2 = step(state1, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics2["loss"]))
    assert float(metrics2["loss"]) != float(metrics["loss"])


@pytest.mark.slow
def test_proposed_v2_symmetric_coordinate_step():
    """The sym-coord ablation bundle: PROPOSED_V2 + symmetric loss +
    predictor heads + coordinate-blended positives (scripts/sym-coord.sh)."""
    model, state, step, batch = _make_everything(
        PretrainType.PROPOSED_V2,
        momentum=0.999,
        lmbd_cp2_dense_loss=0.5,
        instance_logits_temp=0.2,
        dense_logits_temp=0.2,
        use_symmetrical_loss=True,
        use_predictor=True,
        lmbd_coordinate=0.5,
    )
    state1, metrics = step(state, batch, jax.random.PRNGKey(5))
    assert np.isfinite(float(metrics["loss"]))
    # both queues update in the DenseCL family
    assert int(state1.queue_ptr) == BATCH
    assert int(state1.queue2_ptr) == BATCH
    assert float(metrics["step/matching_positives_rate"]) >= -1.0
    # step parity flips the enqueued key set; second step still finite
    state2, metrics2 = step(state1, batch, jax.random.PRNGKey(6))
    assert np.isfinite(float(metrics2["loss"]))


def test_hparam_validation_web():
    from cp2_tpu.types import MappingType, NegativeType

    with pytest.raises(ValueError):
        SSLHyperParams(
            pretrain_type=PretrainType.CP2, negative_type=NegativeType.FIXED
        ).validated()
    with pytest.raises(ValueError):
        SSLHyperParams(
            mapping_type=MappingType.PIXEL_ID, lmbd_pixel_corr_weight=1.0,
            pretrain_type=PretrainType.PROPOSED,
        ).validated()
    with pytest.raises(ValueError):
        SSLHyperParams(
            pretrain_type=PretrainType.DENSECL, dense_logits_temp=1.0
        ).validated()
    # DENSECL via for_variant applies the forced bundle and passes
    hp = SSLHyperParams.for_variant(PretrainType.DENSECL)
    assert hp.dense_logits_temp == 0.2 and hp.lmbd_cp2_dense_loss == 0.5
    # queue capping
    hp = SSLHyperParams.for_variant(PretrainType.CP2, dataset_size=100, cap_queue=True)
    assert hp.queue_len == 100


def test_unet_backbone_rejects_global_and_densecl_paths():
    """Parity guard: the reference's MoCo/BYOL/DenseCL forwards assume the
    segmentor backbone and crash on UNET_* (builder.py:1015-1016 feeding the
    conv projectors of :96-101 flattened input) — here the invalid combination
    fails loudly at init with a named error instead."""
    for pt in (PretrainType.MOCO, PretrainType.DENSECL):
        model = SSLEncoder(
            model_cfg=TINY_MODEL,
            pretrain_type=pt,
            backbone_type=BackboneType.UNET_ENCODER_ONLY,
            dim=DIM,
        )
        x = jnp.zeros((1, 32, 32, 3), jnp.float32)
        with pytest.raises(NotImplementedError):
            model.init(jax.random.PRNGKey(0), x, method="init_all")


@pytest.mark.slow
def test_cp2_unet_truncated_backbone():
    """CP2 over the truncated-U-Net backbone (OS=8, reference builder.py:76-111)."""
    from cp2_tpu.ssl.train_step import dense_output_stride_of

    hp = SSLHyperParams.for_variant(
        PretrainType.CP2, dim=DIM, queue_len=64,
        backbone_type=BackboneType.UNET_TRUNCATED,
    )
    model = SSLEncoder(
        model_cfg=TINY_MODEL,  # ignored by the U-Net path
        pretrain_type=PretrainType.CP2,
        backbone_type=BackboneType.UNET_TRUNCATED,
        dim=DIM,
        unet_truncated_dec_blocks=2,
    )
    os_ = dense_output_stride_of(TINY_MODEL, BackboneType.UNET_TRUNCATED, 2)
    assert os_ == 8
    batch = _tiny_batch(0)
    tx = make_optimizer("sgd", 0.05)
    state = create_pretrain_state(
        jax.random.PRNGKey(0), model, tx, hp, batch["img_a"],
        init_fn=lambda m, r, x: m.init(r, x, method="init_all"),
    )
    step = jax.jit(make_pretrain_step(
        model, tx, hp, os_,
        backbone_output_stride_of(TINY_MODEL, BackboneType.UNET_TRUNCATED, 2),
        metrics_level=0,
    ))
    state1, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))


@pytest.mark.slow
def test_scanned_steps_match_single_steps():
    """K steps under lax.scan (the --steps-per-call dispatch amortization)
    must produce the same state as K single-step dispatches: the per-step
    randomness comes from fold_in(key, state.step) in-step, so chaining is
    invisible to the math (tolerance only for XLA refusion differences)."""
    model, state, step, batch = _make_everything(PretrainType.CP2)
    key = jax.random.PRNGKey(3)
    k = 3
    raws = [_tiny_batch(s) for s in range(k)]

    single = state
    for raw in raws:
        single, _ = step(single, raw, key)

    raw_k = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *raws)
    inner = step.__wrapped__ if hasattr(step, "__wrapped__") else step

    @jax.jit
    def scanned(state, raw_k, key):
        def body(s, one):
            s, m = inner(s, one, key)
            return s, m["loss"]
        return jax.lax.scan(body, state, raw_k)

    chained, losses = scanned(state, raw_k, key)
    assert losses.shape == (k,)
    assert int(chained.step) == int(single.step) == k
    # scanned and single-step programs fuse differently; observed noise
    # after 3 SGD steps is ~5e-6 absolute on O(0.1) params
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-5
        ),
        jax.device_get(chained.params),
        jax.device_get(single.params),
    )
    np.testing.assert_allclose(
        np.asarray(chained.queue), np.asarray(single.queue),
        rtol=5e-3, atol=5e-5,
    )


def test_queue_wraparound():
    from cp2_tpu.ssl.queue import queue_enqueue

    queue = jnp.zeros((8, 4))
    ptr = jnp.asarray(6, jnp.int32)
    keys = jnp.ones((4, 4)) * jnp.arange(1, 5)[:, None]
    new_q, new_ptr = queue_enqueue(queue, ptr, keys)
    assert int(new_ptr) == 2
    np.testing.assert_allclose(np.asarray(new_q[6]), np.full(4, 1.0))
    np.testing.assert_allclose(np.asarray(new_q[7]), np.full(4, 2.0))
    np.testing.assert_allclose(np.asarray(new_q[0]), np.full(4, 3.0))
    np.testing.assert_allclose(np.asarray(new_q[1]), np.full(4, 4.0))


def test_queue_rejects_batch_larger_than_queue():
    """B > K is a trace-time error (reference asserts it, builder.py:578)."""
    from cp2_tpu.ssl.queue import queue_enqueue

    queue = jnp.zeros((4, 4))
    ptr = jnp.asarray(0, jnp.int32)
    keys = jnp.ones((6, 4))
    with pytest.raises(ValueError, match="exceeds queue length"):
        queue_enqueue(queue, ptr, keys)


@pytest.mark.parametrize(
    "variant",
    [PretrainType.CP2, PretrainType.MOCO, PretrainType.BYOL,
     PretrainType.DENSECL],
    ids=lambda v: v.name,
)
@pytest.mark.slow
def test_epoch_vec_matches_scalar_family(variant):
    """epoch_scalars=True at metrics_level=0 returns _epoch_vec whose
    entries equal the variant's train/ scalar family (the values the
    reference averages into epoch aggregates EVERY step,
    builder.py:1608-1664), in epoch_scalar_names order."""
    from cp2_tpu.ssl.train_step import (
        _EPOCH_SOURCES,
        epoch_scalar_names,
    )

    kwargs = {}
    if variant == PretrainType.DENSECL:
        kwargs = dict(
            momentum=0.999, lmbd_cp2_dense_loss=0.5,
            instance_logits_temp=0.2, dense_logits_temp=0.2,
        )
    hp = SSLHyperParams.for_variant(variant, dim=DIM, queue_len=64, **kwargs)
    model = SSLEncoder(
        model_cfg=TINY_MODEL, pretrain_type=variant,
        backbone_type=BackboneType.DEEPLABV3, dim=DIM,
    )
    tx = make_optimizer("sgd", 0.05)
    batch = _tiny_batch(0)
    state = create_pretrain_state(
        jax.random.PRNGKey(0), model, tx, hp, batch["img_a"],
        init_fn=lambda m, r, x: m.init(r, x, method="init_all"),
    )
    os_ = output_stride_of(TINY_MODEL)
    bos = backbone_output_stride_of(TINY_MODEL, BackboneType.DEEPLABV3)
    quiet = jax.jit(make_pretrain_step(
        model, tx, hp, os_, bos, metrics_level=0, epoch_scalars=True))
    full = jax.jit(make_pretrain_step(
        model, tx, hp, os_, bos, metrics_level=1, epoch_scalars=True))

    rng = jax.random.PRNGKey(1)
    _, mq = quiet(state, batch, rng)
    _, mf = full(state, batch, rng)

    names = epoch_scalar_names(variant)
    vec_q = np.asarray(mq["_epoch_vec"])
    vec_f = np.asarray(mf["_epoch_vec"])
    assert vec_q.shape == (len(names),)
    # quiet and metrics-on steps agree on the epoch family exactly
    np.testing.assert_allclose(vec_q, vec_f, rtol=1e-6)
    # and each entry equals its named scalar in the full metrics dict
    for i, name in enumerate(names):
        src = next(s for s in _EPOCH_SOURCES[name] if s in mf)
        np.testing.assert_allclose(
            vec_f[i], float(mf[src]), rtol=1e-6, err_msg=name
        )
    assert np.isfinite(vec_q).all()
