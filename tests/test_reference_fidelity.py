"""THE fidelity gate (SURVEY §7.3): rebuilt objectives vs the reference's
actual loss code, on identical inputs.

``/root/reference/builder.py``'s forwards run on CPU torch (heavy missing
deps stubbed — see ``_reference_harness``); both frameworks share one
deterministic conv encoder, so any disagreement is OUR loss math, not model
weights.  Compared per variant: total loss, instance/dense components, and
the queue-enqueue payload.

What this does NOT cover: BatchNorm semantics (the stub encoder has none) —
pinned separately by the BN trajectory regime in test_training_trajectory.py;
the global-batch-BN-vs-shuffle-BN deviation is documented in PARITY.md and
its layout-invariance proven in test_multichip.py.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp
import flax.linen as nn

from tests._reference_harness import (
    build_reference_model,
    import_reference_builder,
    stub_conv_weights,
)

from cp2_tpu.ssl import SSLHyperParams, create_pretrain_state
from cp2_tpu.ssl.train_step import make_optimizer, make_pretrain_step
from cp2_tpu.types import MappingType, NegativeType, PretrainType

HW = 64
STRIDE = 16  # dense output stride of the stub encoder -> 4x4 feature grid
DIM = 16
BATCH = 4
K = 64
SEED = 11


def make_jax_stub(w_oihw: np.ndarray):
    """JAX twin of the torch stub segmentor: one bias-free strided conv."""
    kernel = jnp.asarray(w_oihw.transpose(2, 3, 1, 0))  # -> HWIO

    class Model(nn.Module):
        def __call__(self, img, *, train=True):
            return self.dense(img, train=train)

        def dense(self, img, *, train=True):
            return jax.lax.conv_general_dilated(
                img, kernel, (STRIDE, STRIDE), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        def init_all(self, img):
            return self.dense(img, train=False)

    return Model()


def _make_batch(seed=3):
    r = np.random.RandomState(seed)
    imgs = {k: r.rand(BATCH, HW, HW, 3).astype(np.float32)
            for k in ("img_a", "img_b")}
    bgs = {}
    for k, (y0, y1, x0, x1) in (("bg0", (8, 40, 16, 56)), ("bg1", (20, 60, 4, 44))):
        bg = r.rand(BATCH, HW, HW, 3).astype(np.float32) * 0.9 + 0.05
        bg[:, y0:y1, x0:x1, :] = 0.0
        bgs[k] = bg
    # overlapping crops of a 96x96 source: ids differ per view but intersect
    ids = np.arange(1, 96 * 96 + 1, dtype=np.int64).reshape(96, 96)
    ids_a = np.stack([ids[i : i + HW, i : i + HW] for i in range(BATCH)])
    ids_b = np.stack([ids[i + 4 : i + 4 + HW, i + 2 : i + 2 + HW]
                      for i in range(BATCH)])
    # region ids: coarse blocks of the same source (duplicated ids, like SAM)
    region = (ids - 1) // 8 % 12 + 1
    region_a = np.stack([region[i : i + HW, i : i + HW] for i in range(BATCH)])
    region_b = np.stack([region[i + 4 : i + 4 + HW, i + 2 : i + 2 + HW]
                         for i in range(BATCH)])
    return {**imgs, **bgs,
            "pixel_ids_a": ids_a, "pixel_ids_b": ids_b,
            "region_ids_a": region_a, "region_ids_b": region_b}


def _queue_np(seed=5):
    r = np.random.RandomState(seed)
    q = r.randn(K, DIM).astype(np.float32)
    return q / np.linalg.norm(q, axis=1, keepdims=True)


def _run_reference(batch, pretrain_type="CP2", mapping_type="CP2",
                   negative_type="NONE", **model_kwargs):
    builder = import_reference_builder()
    torch.manual_seed(0)
    model = build_reference_model(
        builder, dim=DIM, stride=STRIDE, seed=SEED, queue_np=_queue_np(),
        pretrain_type=builder.PretrainType[pretrain_type],
        mapping_type=builder.MappingType[mapping_type],
        negative_type=builder.NegativeType[negative_type],
        **model_kwargs,
    )
    t = {k: torch.from_numpy(np.ascontiguousarray(
            v.transpose(0, 3, 1, 2)) if v.ndim == 4 else v.copy())
         for k, v in batch.items()}
    loss = model(
        img_a=t["img_a"], img_b=t["img_b"], bg0=t["bg0"], bg1=t["bg1"],
        visualize=False, step=0, new_epoch=False,
        pixel_ids_a=t["pixel_ids_a"], pixel_ids_b=t["pixel_ids_b"],
        region_ids_a=t["region_ids_a"], region_ids_b=t["region_ids_b"],
    )
    return {
        "loss": float(loss),
        "loss_instance": float(model.loss_i.val),
        "loss_dense": float(model.loss_d.val),
        "queue": model.queue.detach().numpy().T.copy(),  # -> (K, dim)
        "queue_ptr": int(model.queue_ptr.item()),
    }


def _run_ours(batch, hp: SSLHyperParams):
    model = make_jax_stub(stub_conv_weights(SEED, DIM, STRIDE))
    tx = make_optimizer("sgd", 0.0)
    sample = jnp.zeros((BATCH, HW, HW, 3), jnp.float32)
    state = create_pretrain_state(
        jax.random.PRNGKey(0), model, tx, hp, sample,
        init_fn=lambda m, r, x: m.init(r, x, method="init_all"),
    )
    state = state.replace(queue=jnp.asarray(_queue_np()))
    step = make_pretrain_step(model, tx, hp, STRIDE, 32, metrics_level=1)
    jbatch = {k: jnp.asarray(v.astype(np.int32)) if v.ndim == 3
              else jnp.asarray(v) for k, v in batch.items()}
    new_state, metrics = jax.jit(step)(state, jbatch, jax.random.PRNGKey(1))
    return {
        "loss": float(metrics["loss"]),
        "loss_instance": float(metrics["train/loss_ins_step"]),
        "loss_dense": float(metrics["train/loss_dense_step"]),
        "queue": np.asarray(new_state.queue),
        "queue_ptr": int(new_state.queue_ptr),
    }


def _compare(ref, ours, rtol=2e-4, atol=2e-5):
    np.testing.assert_allclose(ours["loss"], ref["loss"], rtol=rtol, atol=atol)
    np.testing.assert_allclose(
        ours["loss_instance"], ref["loss_instance"], rtol=rtol, atol=atol
    )
    np.testing.assert_allclose(
        ours["loss_dense"], ref["loss_dense"], rtol=rtol, atol=atol
    )
    assert ours["queue_ptr"] == ref["queue_ptr"] % K
    np.testing.assert_allclose(
        ours["queue"], ref["queue"], rtol=1e-3, atol=1e-5
    )
    return ref, ours


@pytest.mark.slow
def test_cp2_matches_reference():
    """Flagship: CP2 defaults (unit weights, NONE negatives)."""
    batch = _make_batch()
    ref = _run_reference(batch, pretrain_type="CP2")
    hp = SSLHyperParams.for_variant(PretrainType.CP2, dim=DIM, queue_len=K)
    ours = _run_ours(batch, hp)
    _compare(ref, ours)


@pytest.mark.slow
def test_cp2_include_background_matches_reference():
    batch = _make_batch(seed=7)
    ref = _run_reference(batch, pretrain_type="CP2", include_background=True)
    hp = SSLHyperParams.for_variant(
        PretrainType.CP2, dim=DIM, queue_len=K, include_background=True
    )
    ours = _run_ours(batch, hp)
    _compare(ref, ours)


@pytest.mark.slow
def test_proposed_pixel_region_weights_match_reference():
    """PROPOSED + PIXEL_REGION_ID: exercises the correspondence-weight mask
    (builder.py:1204-1243) end to end."""
    batch = _make_batch(seed=9)
    kwargs = dict(
        lmbd_pixel_corr_weight=3.0,
        lmbd_region_corr_weight=2.0,
        lmbd_not_corr_weight=0.5,
    )
    ref = _run_reference(
        batch, pretrain_type="PROPOSED", mapping_type="PIXEL_REGION_ID",
        **kwargs,
    )
    hp = SSLHyperParams.for_variant(
        PretrainType.PROPOSED, dim=DIM, queue_len=K,
        mapping_type=MappingType.PIXEL_REGION_ID, **kwargs,
    )
    ours = _run_ours(batch, hp)
    _compare(ref, ours)


@pytest.mark.slow
@pytest.mark.parametrize("negative_type", ["FIXED", "AVERAGE", "MEDIAN"])
def test_proposed_negative_types_match_reference(negative_type):
    batch = _make_batch(seed=13)
    ref = _run_reference(
        batch, pretrain_type="PROPOSED", negative_type=negative_type,
        negative_scale=2,
    )
    hp = SSLHyperParams.for_variant(
        PretrainType.PROPOSED, dim=DIM, queue_len=K,
        negative_type=NegativeType[negative_type], negative_scale=2,
    )
    ours = _run_ours(batch, hp)
    _compare(ref, ours)


@pytest.mark.slow
def test_hard_negative_reference_bug_documented_deviation():
    """The reference's HARD branch (builder.py:1374-1380) writes through a
    fancy-indexing COPY (``t[mask][mask2] *= 1.5``) — a silent no-op, so
    reference-HARD trains identically to NONE.  The rebuild implements the
    evident intent (scale hard negatives by 1.5).  This test pins down both
    facts so the deviation stays deliberate (PARITY.md deviation #6)."""
    batch = _make_batch(seed=13)
    ref_hard = _run_reference(
        batch, pretrain_type="PROPOSED", negative_type="HARD", negative_scale=2
    )
    ref_none = _run_reference(
        batch, pretrain_type="PROPOSED", negative_type="NONE", negative_scale=2
    )
    # proof of the upstream bug: HARD == NONE in the reference
    np.testing.assert_allclose(
        ref_hard["loss"], ref_none["loss"], rtol=1e-6, atol=1e-7
    )
    ours_hard = _run_ours(batch, SSLHyperParams.for_variant(
        PretrainType.PROPOSED, dim=DIM, queue_len=K,
        negative_type=NegativeType.HARD, negative_scale=2,
    ))
    # ours actually scales hard negatives: dense loss must differ from NONE
    assert abs(ours_hard["loss_dense"] - ref_none["loss_dense"]) > 1e-3
    # instance loss and queue are untouched by the dense negative reshaping
    np.testing.assert_allclose(
        ours_hard["loss_instance"], ref_none["loss_instance"],
        rtol=2e-4, atol=2e-5,
    )
    np.testing.assert_allclose(
        ours_hard["queue"], ref_none["queue"], rtol=1e-3, atol=1e-5
    )
