"""Multi-step training-TRAJECTORY parity vs the reference (SURVEY §7.3).

``test_reference_fidelity*`` pins single forwards; this closes the loop on
*dynamics*: N full optimizer steps — SGD+momentum+weight-decay on the query
encoder, EMA (m=0.999) key-encoder update in the reference's order
(pre-update, before the key forward — builder.py:471-476), and queue
enqueues — on identical data must track the reference's per-step loss
trajectory AND end at the same query/key weights.

Single device. The first two regimes use a norm-free stub (any
disagreement is optimizer math, EMA ordering, or queue/loss drift); the
third adds BatchNorm to pin running-stat/EMA/buffer semantics — see the
BN section below.

Reference pieces exercised: ``builder.py:278-476`` (MODEL init, momentum
update), ``forward_cp2``, and ``main.py:467-477`` (SGD momentum=0.9,
weight_decay=1e-4).
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
from tests.test_reference_fidelity import (
    BATCH,
    DIM,
    HW,
    K,
    SEED,
    STRIDE,
    _make_batch,
    _queue_np,
)

from cp2_tpu.ssl import SSLHyperParams, create_pretrain_state
from cp2_tpu.ssl.train_step import make_optimizer, make_pretrain_step
from cp2_tpu.types import PretrainType

N_STEPS = 6
LR = 0.05


def make_trainable_jax_stub(w_oihw: np.ndarray):
    """Like test_reference_fidelity.make_jax_stub, but the kernel is a
    trainable flax param so the optimizer/EMA act on it."""
    w_hwio = jnp.asarray(w_oihw.transpose(2, 3, 1, 0))

    class Model(nn.Module):
        def setup(self):
            self.kernel = self.param("kernel", lambda rng: w_hwio)

        def __call__(self, img, *, train=True):
            return self.dense(img, train=train)

        def dense(self, img, *, train=True):
            return jax.lax.conv_general_dilated(
                img, self.kernel, (STRIDE, STRIDE), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        def init_all(self, img):
            return self.dense(img, train=False)

    return Model()


def _batches():
    return [_make_batch(seed=100 + i) for i in range(N_STEPS)]


def _run_reference_trajectory(batches, pretrain_type="CP2",
                              mapping_type="CP2", **model_kwargs):
    builder = import_reference_builder()
    torch.manual_seed(0)
    model = build_reference_model(
        builder, dim=DIM, stride=STRIDE, seed=SEED, queue_np=_queue_np(),
        pretrain_type=builder.PretrainType[pretrain_type],
        mapping_type=builder.MappingType[mapping_type],
        **model_kwargs,
    )
    opt = torch.optim.SGD(
        [p for p in model.parameters() if p.requires_grad],
        lr=LR, momentum=0.9, weight_decay=1e-4,
    )
    losses = []
    for i, b in enumerate(batches):
        t = {k: torch.from_numpy(np.ascontiguousarray(
                v.transpose(0, 3, 1, 2)) if v.ndim == 4 else v.copy())
             for k, v in b.items()}
        loss = model(
            img_a=t["img_a"], img_b=t["img_b"], bg0=t["bg0"], bg1=t["bg1"],
            visualize=False, step=i, new_epoch=False,
            pixel_ids_a=t["pixel_ids_a"], pixel_ids_b=t["pixel_ids_b"],
            region_ids_a=t["region_ids_a"], region_ids_b=t["region_ids_b"],
        )
        opt.zero_grad()
        loss.backward()
        opt.step()
        losses.append(float(loss.detach()))
    w_q = model.encoder_q.dense_conv.weight.detach().numpy().copy()
    w_k = model.encoder_k.dense_conv.weight.detach().numpy().copy()
    return losses, w_q, w_k


def _run_ours_trajectory(batches, hp=None):
    if hp is None:
        hp = SSLHyperParams.for_variant(PretrainType.CP2, dim=DIM,
                                        queue_len=K)
    model = make_trainable_jax_stub(stub_conv_weights(SEED, DIM, STRIDE))
    tx = make_optimizer("sgd", LR)  # momentum=0.9, weight_decay=1e-4
    sample = jnp.zeros((BATCH, HW, HW, 3), jnp.float32)
    state = create_pretrain_state(
        jax.random.PRNGKey(0), model, tx, hp, sample,
        init_fn=lambda m, r, x: m.init(r, x, method="init_all"),
    )
    state = state.replace(queue=jnp.asarray(_queue_np()))
    step = jax.jit(make_pretrain_step(model, tx, hp, STRIDE, 32,
                                      metrics_level=1))
    losses = []
    for i, b in enumerate(batches):
        jb = {k: jnp.asarray(v.astype(np.int32)) if v.ndim == 3
              else jnp.asarray(v) for k, v in b.items()}
        state, metrics = step(state, jb,
                              jax.random.fold_in(jax.random.PRNGKey(1), i))
        losses.append(float(metrics["loss"]))
    # HWIO -> OIHW for comparison against torch
    w_q = np.asarray(state.params["kernel"]).transpose(3, 2, 0, 1)
    w_k = np.asarray(state.ema_params["kernel"]).transpose(3, 2, 0, 1)
    return losses, w_q, w_k


@pytest.mark.slow
def test_cp2_training_trajectory_matches_reference():
    batches = _batches()
    ref_losses, ref_wq, ref_wk = _run_reference_trajectory(batches)
    our_losses, our_wq, our_wk = _run_ours_trajectory(batches)

    # losses must track step by step (divergence compounds through the
    # optimizer+EMA+queue state, so the tolerance is looser than the
    # single-forward 2e-4 gate)
    np.testing.assert_allclose(our_losses, ref_losses, rtol=1e-3)
    # the trajectory must also END in the same place
    np.testing.assert_allclose(our_wq, ref_wq, rtol=2e-3, atol=1e-6)
    np.testing.assert_allclose(our_wk, ref_wk, rtol=2e-3, atol=1e-6)
    # sanity: training actually moved the weights
    assert not np.allclose(ref_wq, stub_conv_weights(SEED, DIM, STRIDE))


# ---------------------------------------------------------------------------
# BatchNorm-semantics regime (the hole PARITY.md's fidelity table documents):
# a BN-bearing encoder pins, against the reference's actual code,
#   * train-mode batch-stat normalization on BOTH encoder paths,
#   * EMA over .parameters() ONLY — γ/β averaged, running stats NOT
#     (builder.py:557-567 excludes buffers),
#   * independent running-stat evolution of query vs key encoders
#     (torch momentum 0.1 == flax momentum 0.9),
#   * the biased(flax)/unbiased(torch) running-VARIANCE law.
# ---------------------------------------------------------------------------

BN_MOMENTUM = 0.9  # flax convention; == torch BatchNorm2d momentum 0.1


def make_trainable_jax_bn_stub(w_oihw: np.ndarray):
    """Conv (trainable) -> BatchNorm, the flax twin of the torch BN stub."""
    w_hwio = jnp.asarray(w_oihw.transpose(2, 3, 1, 0))

    class Model(nn.Module):
        def setup(self):
            self.kernel = self.param("kernel", lambda rng: w_hwio)
            self.bn = nn.BatchNorm(
                use_running_average=None, momentum=BN_MOMENTUM,
                epsilon=1e-5, dtype=jnp.float32,
            )

        def __call__(self, img, *, train=True):
            return self.dense(img, train=train)

        def dense(self, img, *, train=True):
            x = jax.lax.conv_general_dilated(
                img, self.kernel, (STRIDE, STRIDE), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return self.bn(x, use_running_average=not train)

        def init_all(self, img):
            return self.dense(img, train=False)

    return Model()


def _torch_bn_state(enc):
    bn = enc.bn
    return {
        "scale": bn.weight.detach().numpy().copy(),
        "bias": bn.bias.detach().numpy().copy(),
        "mean": bn.running_mean.detach().numpy().copy(),
        "var": bn.running_var.detach().numpy().copy(),
    }


def _run_reference_bn_trajectory(batches):
    builder = import_reference_builder()
    torch.manual_seed(0)
    model = build_reference_model(
        builder, dim=DIM, stride=STRIDE, seed=SEED, queue_np=_queue_np(),
        pretrain_type=builder.PretrainType.CP2,
        mapping_type=builder.MappingType.CP2,
        stub_bn=True,
    )
    # post-construction buffers: MODEL.__init__ probed encoder_q in train
    # mode with random data (builder.py:392-402), and the param copy-loop
    # (builder.py:464-469) does NOT copy buffers — so q and k START with
    # different running stats.  Capture both for injection.
    init_q = _torch_bn_state(model.encoder_q)
    init_k = _torch_bn_state(model.encoder_k)
    opt = torch.optim.SGD(
        [p for p in model.parameters() if p.requires_grad],
        lr=LR, momentum=0.9, weight_decay=1e-4,
    )
    losses = []
    for i, b in enumerate(batches):
        t = {k: torch.from_numpy(np.ascontiguousarray(
                v.transpose(0, 3, 1, 2)) if v.ndim == 4 else v.copy())
             for k, v in b.items()}
        loss = model(
            img_a=t["img_a"], img_b=t["img_b"], bg0=t["bg0"], bg1=t["bg1"],
            visualize=False, step=i, new_epoch=False,
            pixel_ids_a=t["pixel_ids_a"], pixel_ids_b=t["pixel_ids_b"],
            region_ids_a=t["region_ids_a"], region_ids_b=t["region_ids_b"],
        )
        opt.zero_grad()
        loss.backward()
        opt.step()
        losses.append(float(loss.detach()))
    return {
        "losses": losses,
        "w_q": model.encoder_q.dense_conv.weight.detach().numpy().copy(),
        "w_k": model.encoder_k.dense_conv.weight.detach().numpy().copy(),
        "init_q": init_q, "init_k": init_k,
        "final_q": _torch_bn_state(model.encoder_q),
        "final_k": _torch_bn_state(model.encoder_k),
    }


def _run_ours_bn_trajectory(batches, init_q, init_k):
    hp = SSLHyperParams.for_variant(PretrainType.CP2, dim=DIM, queue_len=K)
    model = make_trainable_jax_bn_stub(stub_conv_weights(SEED, DIM, STRIDE))
    tx = make_optimizer("sgd", LR)
    sample = jnp.zeros((BATCH, HW, HW, 3), jnp.float32)
    state = create_pretrain_state(
        jax.random.PRNGKey(0), model, tx, hp, sample,
        init_fn=lambda m, r, x: m.init(r, x, method="init_all"),
    )
    # inject the torch model's exact post-construction state: affine params
    # (identical q/k after the reference's copy loop) and the DIFFERENT
    # per-encoder running stats
    params = dict(state.params)
    params["bn"] = {"scale": jnp.asarray(init_q["scale"]),
                    "bias": jnp.asarray(init_q["bias"])}
    state = state.replace(
        params=params,
        ema_params=jax.tree_util.tree_map(jnp.copy, params),
        batch_stats={"bn": {"mean": jnp.asarray(init_q["mean"]),
                            "var": jnp.asarray(init_q["var"])}},
        ema_batch_stats={"bn": {"mean": jnp.asarray(init_k["mean"]),
                                "var": jnp.asarray(init_k["var"])}},
        queue=jnp.asarray(_queue_np()),
    )
    step = jax.jit(make_pretrain_step(model, tx, hp, STRIDE, 32,
                                      metrics_level=1))
    losses = []
    for i, b in enumerate(batches):
        jb = {k: jnp.asarray(v.astype(np.int32)) if v.ndim == 3
              else jnp.asarray(v) for k, v in b.items()}
        state, metrics = step(state, jb,
                              jax.random.fold_in(jax.random.PRNGKey(1), i))
        losses.append(float(metrics["loss"]))

    def tree_np(t):
        return jax.tree_util.tree_map(np.asarray, t)

    return {
        "losses": losses,
        "w_q": np.asarray(state.params["kernel"]).transpose(3, 2, 0, 1),
        "w_k": np.asarray(state.ema_params["kernel"]).transpose(3, 2, 0, 1),
        "bn_q": tree_np(state.params["bn"]),
        "bn_k": tree_np(state.ema_params["bn"]),
        "stats_q": tree_np(state.batch_stats["bn"]),
        "stats_k": tree_np(state.ema_batch_stats["bn"]),
    }


def _expected_torch_running_var(ours_var, init_var, n_updates, n_elems):
    """flax accumulates BIASED batch var into the running stat; torch
    accumulates UNBIASED (n/(n-1)).  Both mix with the same momentum from
    the same init, so: torch_T = m^T·init + c·(flax_T − m^T·init)."""
    decay = BN_MOMENTUM ** n_updates
    c = n_elems / (n_elems - 1)
    return decay * init_var + c * (ours_var - decay * init_var)


@pytest.mark.slow
def test_cp2_bn_training_trajectory_matches_reference():
    batches = _batches()
    ref = _run_reference_bn_trajectory(batches)
    ours = _run_ours_bn_trajectory(batches, ref["init_q"], ref["init_k"])

    # the construction quirk must be real, or the injection proves nothing:
    # q was probed in train mode, k was not
    assert not np.allclose(ref["init_q"]["mean"], ref["init_k"]["mean"])

    np.testing.assert_allclose(ours["losses"], ref["losses"], rtol=1e-3)
    np.testing.assert_allclose(ours["w_q"], ref["w_q"], rtol=2e-3, atol=1e-6)
    np.testing.assert_allclose(ours["w_k"], ref["w_k"], rtol=2e-3, atol=1e-6)

    # EMA covers the BN affine params (they are .parameters())...
    for k in ("scale", "bias"):
        np.testing.assert_allclose(ours["bn_q"][k], ref["final_q"][k],
                                   rtol=2e-3, atol=1e-6)
        np.testing.assert_allclose(ours["bn_k"][k], ref["final_k"][k],
                                   rtol=2e-3, atol=1e-6)
    # γ actually trained and the key γ actually EMA'd away from init
    assert not np.allclose(ref["final_q"]["scale"], ref["init_q"]["scale"])

    # ...but NOT the running stats: each encoder's stats evolve through its
    # own forwards only.  Means match directly (same momentum law).
    np.testing.assert_allclose(ours["stats_q"]["mean"], ref["final_q"]["mean"],
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(ours["stats_k"]["mean"], ref["final_k"]["mean"],
                               rtol=1e-4, atol=1e-6)
    # key stats moved (train-mode key forwards) and differ from query stats
    assert not np.allclose(ref["final_k"]["mean"], ref["init_k"]["mean"])
    assert not np.allclose(ref["final_k"]["mean"], ref["final_q"]["mean"])

    # variances match through the biased/unbiased conversion law
    n_elems = BATCH * (HW // STRIDE) ** 2
    for enc, init in (("q", ref["init_q"]), ("k", ref["init_k"])):
        expected = _expected_torch_running_var(
            ours[f"stats_{enc}"]["var"], init["var"], N_STEPS, n_elems
        )
        np.testing.assert_allclose(expected, ref[f"final_{enc}"]["var"],
                                   rtol=1e-4, atol=1e-6)


# ---------------------------------------------------------------------------
# DenseCL-family dynamics: forward_densecl (builder.py:667-999) trains the
# stage-4 backbone THROUGH the DenseCLNeck with similarity-matched local
# positives and the second queue — a gradient path none of the regimes
# above touch.  The neck weights are extracted from the reference's own
# construction at t=0 (tests/_reference_harness.extract_densecl_neck), so
# both frameworks start identical and must stay locked through N optimizer
# steps, ending at the same backbone (q AND EMA'd k) and neck weights.
# ---------------------------------------------------------------------------


def _densecl_pieces():
    from tests.test_reference_fidelity_variants import (
        BOS_DENSE,
        DIM as V_DIM,
        HW_DENSE,
        K as V_K,
        SEED as V_SEED,
        _make_batch as _v_batch,
        _queue_np as _v_queue,
    )

    return BOS_DENSE, V_DIM, HW_DENSE, V_K, V_SEED, _v_batch, _v_queue


def make_trainable_densecl_stub(dense_oihw, backbone_oihw, dense_stride,
                                backbone_stride, dim):
    """JAX twin of the torch DenseCL stub with a TRAINABLE backbone kernel
    and our real DenseCLNeck.  The dense head is a constant: the reference's
    ``dense_conv`` receives no gradient in forward_densecl (grad None →
    torch SGD skips it entirely), so it must not be a decayed param here."""
    from cp2_tpu.models.necks import DenseCLNeck

    dense_hwio = jnp.asarray(dense_oihw.transpose(2, 3, 1, 0))
    backbone_hwio = jnp.asarray(backbone_oihw.transpose(2, 3, 1, 0))

    class Model(nn.Module):
        def setup(self):
            self.backbone_kernel = self.param(
                "backbone_kernel", lambda rng: backbone_hwio
            )
            self.neck = DenseCLNeck(
                in_channels=2048, hid_channels=2048, out_channels=dim
            )

        def _conv(self, img, kernel, stride):
            return jax.lax.conv_general_dilated(
                img, kernel, (stride, stride), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        def __call__(self, img, *, train=True):
            return self.dense(img, train=train)

        def dense(self, img, *, train=True):
            return self._conv(img, dense_hwio, dense_stride)

        def backbone_feats(self, img, *, train=True):
            return self._conv(img, self.backbone_kernel, backbone_stride)

        def densecl_embed(self, img, *, train=True):
            f = self.backbone_feats(img, train=train)
            return self.neck(f, train=train), f

        def init_all(self, img):
            out = self.dense(img, train=False)
            self.densecl_embed(img, train=False)
            return out

    return Model()


@pytest.mark.slow
def test_densecl_training_trajectory_matches_reference():
    from tests._reference_harness import extract_densecl_neck

    BOS, V_DIM, HW_D, V_K, V_SEED, _v_batch, _v_queue = _densecl_pieces()
    n_steps = 6
    batches = [_v_batch(HW_D, seed=200 + i) for i in range(n_steps)]

    # --- reference: build, snapshot the neck at t=0, then train -----------
    builder = import_reference_builder()
    torch.manual_seed(V_SEED)
    ref_model = build_reference_model(
        builder, dim=V_DIM, stride=HW_D // 4, seed=V_SEED,
        queue_np=_v_queue(5), queue2_np=_v_queue(6), backbone_stride=BOS,
        pretrain_type=builder.PretrainType["DENSECL"],
        lmbd_cp2_dense_loss=0.5, dense_logits_temp=0.2,
    )
    neck0 = extract_densecl_neck(ref_model.encoder_q.neck)
    opt = torch.optim.SGD(
        [p for p in ref_model.parameters() if p.requires_grad],
        lr=LR, momentum=0.9, weight_decay=1e-4,
    )
    ref_losses = []
    for i, b in enumerate(batches):
        t = {k: torch.from_numpy(np.ascontiguousarray(
                v.transpose(0, 3, 1, 2)) if v.ndim == 4 else v.copy())
             for k, v in b.items()}
        loss = ref_model(
            img_a=t["img_a"], img_b=t["img_b"], bg0=t["bg0"], bg1=t["bg1"],
            visualize=False, step=i, new_epoch=False,
            pixel_ids_a=t["pixel_ids_a"], pixel_ids_b=t["pixel_ids_b"],
            region_ids_a=t["region_ids_a"], region_ids_b=t["region_ids_b"],
        )
        opt.zero_grad()
        loss.backward()
        opt.step()
        ref_losses.append(float(loss.detach()))
    ref_wq = ref_model.encoder_q.backbone.conv.weight.detach().numpy().copy()
    ref_wk = ref_model.encoder_k.backbone.conv.weight.detach().numpy().copy()
    ref_neck_q = extract_densecl_neck(ref_model.encoder_q.neck)
    ref_neck_k = extract_densecl_neck(ref_model.encoder_k.neck)

    # --- ours: identical t=0 weights, N jitted full steps ------------------
    hp = SSLHyperParams.for_variant(
        PretrainType.DENSECL, dim=V_DIM, queue_len=V_K
    )
    model = make_trainable_densecl_stub(
        stub_conv_weights(V_SEED, V_DIM, HW_D // 4),
        stub_conv_weights(V_SEED + 1, 2048, BOS),
        HW_D // 4, BOS, V_DIM,
    )
    tx = make_optimizer("sgd", LR)
    sample = jnp.zeros((4, HW_D, HW_D, 3), jnp.float32)
    state = create_pretrain_state(
        jax.random.PRNGKey(0), model, tx, hp, sample,
        init_fn=lambda m, r, x: m.init(r, x, method="init_all"),
    )
    params = jax.device_get(state.params)
    params["neck"] = neck0
    state = state.replace(
        params=params,
        ema_params=jax.tree_util.tree_map(np.copy, params),
        queue=jnp.asarray(_v_queue(5)),
        queue2=jnp.asarray(_v_queue(6)),
    )
    step = jax.jit(
        make_pretrain_step(model, tx, hp, HW_D // 4, BOS, metrics_level=1)
    )
    our_losses = []
    for i, b in enumerate(batches):
        jb = {k: jnp.asarray(v.astype(np.int32)) if v.ndim == 3
              else jnp.asarray(v) for k, v in b.items()}
        state, metrics = step(state, jb,
                              jax.random.fold_in(jax.random.PRNGKey(1), i))
        our_losses.append(float(metrics["loss"]))

    np.testing.assert_allclose(our_losses, ref_losses, rtol=1e-3)
    our_wq = np.asarray(state.params["backbone_kernel"]).transpose(3, 2, 0, 1)
    our_wk = np.asarray(
        state.ema_params["backbone_kernel"]
    ).transpose(3, 2, 0, 1)
    np.testing.assert_allclose(our_wq, ref_wq, rtol=2e-3, atol=1e-6)
    np.testing.assert_allclose(our_wk, ref_wk, rtol=2e-3, atol=1e-6)
    # the neck (projectors+predictors) must track too — both the trained
    # query copy and the EMA'd key copy
    for ref_neck, ours_neck in (
        (ref_neck_q, jax.device_get(state.params["neck"])),
        (ref_neck_k, jax.device_get(state.ema_params["neck"])),
    ):
        ref_leaves, treedef = jax.tree_util.tree_flatten(ref_neck)
        our_leaves = treedef.flatten_up_to(ours_neck)
        for r, o in zip(ref_leaves, our_leaves):
            np.testing.assert_allclose(o, r, rtol=2e-3, atol=1e-6)
    # training actually moved things
    assert not np.allclose(ref_wq, stub_conv_weights(V_SEED + 1, 2048, BOS))


def _torch_trajectory_steps(model, batches, *, with_ids):
    """Shared torch-side loop: SGD(momentum 0.9, wd 1e-4) over the
    reference model's trainable params, per-step losses out."""
    opt = torch.optim.SGD(
        [p for p in model.parameters() if p.requires_grad],
        lr=LR, momentum=0.9, weight_decay=1e-4,
    )
    losses = []
    for i, b in enumerate(batches):
        t = {k: torch.from_numpy(np.ascontiguousarray(
                v.transpose(0, 3, 1, 2)) if v.ndim == 4 else v.copy())
             for k, v in b.items()}
        kwargs = dict(
            img_a=t["img_a"], img_b=t["img_b"], bg0=t["bg0"], bg1=t["bg1"],
            visualize=False, step=i, new_epoch=False,
        )
        if with_ids:
            kwargs.update(
                pixel_ids_a=t["pixel_ids_a"], pixel_ids_b=t["pixel_ids_b"],
                region_ids_a=t["region_ids_a"], region_ids_b=t["region_ids_b"],
            )
        loss = model(**kwargs)
        opt.zero_grad()
        loss.backward()
        opt.step()
        losses.append(float(loss.detach()))
    return losses


def _jax_trajectory_steps(model, hp, batches, hw, bos, inject):
    """Shared JAX-side loop: init, inject t=0 head weights, run N jitted
    full steps. Returns (losses, final_state)."""
    tx = make_optimizer("sgd", LR)
    sample = jnp.zeros((4, hw, hw, 3), jnp.float32)
    state = create_pretrain_state(
        jax.random.PRNGKey(0), model, tx, hp, sample,
        init_fn=lambda m, r, x: m.init(r, x, method="init_all"),
    )
    params = jax.device_get(state.params)
    params.update(inject)
    from tests.test_reference_fidelity_variants import _queue_np as _v_queue

    state = state.replace(
        params=params,
        ema_params=jax.tree_util.tree_map(np.copy, params),
        queue=jnp.asarray(_v_queue(5)),
        queue2=jnp.asarray(_v_queue(6)),
    )
    step = jax.jit(make_pretrain_step(model, tx, hp, hw // 4, bos,
                                      metrics_level=1))
    losses = []
    for i, b in enumerate(batches):
        jb = {k: jnp.asarray(v.astype(np.int32)) if v.ndim == 3
              else jnp.asarray(v) for k, v in b.items()}
        state, metrics = step(state, jb,
                              jax.random.fold_in(jax.random.PRNGKey(1), i))
        losses.append(float(metrics["loss"]))
    return losses, state


def _assert_trees_close(ref_tree, ours_tree, *, rtol=2e-3, atol=1e-6):
    ref_leaves, treedef = jax.tree_util.tree_flatten(ref_tree)
    for r, o in zip(ref_leaves, treedef.flatten_up_to(ours_tree)):
        np.testing.assert_allclose(o, r, rtol=rtol, atol=atol)


def make_trainable_global_stub(dense_oihw, backbone_oihw, dense_stride,
                               backbone_stride, dim, byol):
    """MoCo/BYOL twin: trainable backbone + our GlobalProjector/MLP heads
    (BN-bearing for BYOL). Dense head constant, as in the DenseCL stub."""
    from cp2_tpu.models.layers import MLP
    from cp2_tpu.models.necks import GlobalProjector

    dense_hwio = jnp.asarray(dense_oihw.transpose(2, 3, 1, 0))
    backbone_hwio = jnp.asarray(backbone_oihw.transpose(2, 3, 1, 0))

    class Model(nn.Module):
        def setup(self):
            self.backbone_kernel = self.param(
                "backbone_kernel", lambda rng: backbone_hwio
            )
            self.projector = GlobalProjector(hidden=2048, out=dim,
                                             use_bn=byol)
            self.predictor = MLP(hidden=2048, out=dim, use_bn=byol)

        def _conv(self, img, kernel, stride):
            return jax.lax.conv_general_dilated(
                img, kernel, (stride, stride), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        def __call__(self, img, *, train=True):
            return self.dense(img, train=train)

        def dense(self, img, *, train=True):
            return self._conv(img, dense_hwio, dense_stride)

        def backbone_feats(self, img, *, train=True):
            return self._conv(img, self.backbone_kernel, backbone_stride)

        def global_embed(self, img, *, train=True):
            return self.projector(self.backbone_feats(img, train=train),
                                  train=train)

        def predict(self, z, *, train=True):
            return self.predictor(z, train=train)

        def init_all(self, img):
            out = self.dense(img, train=False)
            self.predict(self.global_embed(img, train=False), train=False)
            return out

    return Model()


@pytest.mark.slow
@pytest.mark.parametrize("variant", ["MOCO", "BYOL"])
def test_global_variant_training_trajectory_matches_reference(variant):
    """MoCo/BYOL dynamics: the flattened-projector gradient path (and for
    BYOL the train-mode-BN MLP heads + symmetric regression, no queue).
    With DENSECL below, every forward family now has a trajectory pin."""
    from tests._reference_harness import extract_projector_mlp
    from tests.test_reference_fidelity_variants import (
        BOS_GLOBAL,
        DIM as V_DIM,
        HW_GLOBAL,
        K as V_K,
        SEED as V_SEED,
        _make_batch as _v_batch,
        _queue_np as _v_queue,
    )

    batches = [_v_batch(HW_GLOBAL, seed=300 + i, with_ids=False)
               for i in range(N_STEPS)]

    builder = import_reference_builder()
    torch.manual_seed(V_SEED)
    ref_model = build_reference_model(
        builder, dim=V_DIM, stride=HW_GLOBAL // 4, seed=V_SEED,
        queue_np=_v_queue(5), queue2_np=_v_queue(6),
        backbone_stride=BOS_GLOBAL,
        pretrain_type=builder.PretrainType[variant],
        # the reference DRIVER sets m=0.996 for the global family
        # (main.py:391-400); MODEL's own default is the dense-family 0.999
        m=0.996,
    )
    if variant == "BYOL":
        # Reference construction quirk (PARITY deviation #10): ONE
        # BatchNorm1d instance is built (builder.py:411-415) and placed in
        # BOTH the projector and the predictor Sequentials (:416-428), so
        # their gamma/beta are tied and receive summed gradients. The
        # rebuild gives each head its own BN; prove the tie exists, then
        # untie the torch copy so the trajectory pins everything else.
        import copy

        assert ref_model.encoder_q.projector[1] is ref_model.predictor[1]
        ref_model.predictor[1] = copy.deepcopy(ref_model.predictor[1])
    s = HW_GLOBAL // BOS_GLOBAL
    inject = {
        "projector": {"mlp": extract_projector_mlp(
            ref_model.encoder_q.projector, chw=(2048, s, s))},
        "predictor": extract_projector_mlp(ref_model.predictor),
    }
    ref_losses = _torch_trajectory_steps(ref_model, batches, with_ids=False)
    ref_wq = ref_model.encoder_q.backbone.conv.weight.detach().numpy().copy()
    ref_wk = ref_model.encoder_k.backbone.conv.weight.detach().numpy().copy()

    hp = SSLHyperParams.for_variant(PretrainType[variant], dim=V_DIM,
                                    queue_len=V_K)
    model = make_trainable_global_stub(
        stub_conv_weights(V_SEED, V_DIM, HW_GLOBAL // 4),
        stub_conv_weights(V_SEED + 1, 2048, BOS_GLOBAL),
        HW_GLOBAL // 4, BOS_GLOBAL, V_DIM, byol=variant == "BYOL",
    )
    our_losses, state = _jax_trajectory_steps(
        model, hp, batches, HW_GLOBAL, BOS_GLOBAL, inject
    )

    np.testing.assert_allclose(our_losses, ref_losses, rtol=1e-3)
    our_wq = np.asarray(state.params["backbone_kernel"]).transpose(3, 2, 0, 1)
    our_wk = np.asarray(
        state.ema_params["backbone_kernel"]).transpose(3, 2, 0, 1)
    # atol 5e-6: near-zero kernel entries accumulate ~1e-6 of f32 noise
    # over 6 steps (weights are N(0, 0.05) — 5e-6 is 1e-4 of scale)
    np.testing.assert_allclose(our_wq, ref_wq, rtol=2e-3, atol=5e-6)
    np.testing.assert_allclose(our_wk, ref_wk, rtol=2e-3, atol=5e-6)
    # trained projector (q) and its EMA'd key copy must track
    _assert_trees_close(
        {"mlp": extract_projector_mlp(ref_model.encoder_q.projector,
                                      chw=(2048, s, s))},
        jax.device_get(state.params["projector"]), atol=1e-5,
    )
    _assert_trees_close(
        {"mlp": extract_projector_mlp(ref_model.encoder_k.projector,
                                      chw=(2048, s, s))},
        jax.device_get(state.ema_params["projector"]), atol=1e-5,
    )
    if variant == "BYOL":
        # the predictor trains on the query side only (no EMA copy in the
        # reference — it sits outside encoder_q/k)
        _assert_trees_close(
            extract_projector_mlp(ref_model.predictor),
            jax.device_get(state.params["predictor"]), atol=1e-5,
        )
    # MoCo's predictor is constructed but unused (builder.py:1001-1077):
    # torch leaves it untouched (grad None -> SGD skips the param) while
    # optax decays zero-grad params, so it is deliberately NOT compared.


@pytest.mark.slow
def test_proposed_v2_symmetric_training_trajectory_matches_reference():
    """PROPOSED_V2 + use_symmetrical_loss alternates which key set feeds
    which queue BY STEP PARITY (builder.py:944-972) — behavior only a
    multi-step run exercises. Pins losses, weights, AND both final queue
    payloads/pointer across 6 steps (3 of each parity)."""
    from tests._reference_harness import extract_densecl_neck
    from tests.test_reference_fidelity_variants import _queue_np as _v_queue

    BOS, V_DIM, HW_D, V_K, V_SEED, _v_batch, _ = _densecl_pieces()
    batches = [_v_batch(HW_D, seed=400 + i) for i in range(N_STEPS)]

    builder = import_reference_builder()
    torch.manual_seed(V_SEED)
    ref_model = build_reference_model(
        builder, dim=V_DIM, stride=HW_D // 4, seed=V_SEED,
        queue_np=_v_queue(5), queue2_np=_v_queue(6), backbone_stride=BOS,
        pretrain_type=builder.PretrainType["PROPOSED_V2"],
        use_symmetrical_loss=True,
        lmbd_cp2_dense_loss=0.5, dense_logits_temp=0.2,
    )
    neck0 = extract_densecl_neck(ref_model.encoder_q.neck)
    ref_losses = _torch_trajectory_steps(ref_model, batches, with_ids=True)
    ref_wq = ref_model.encoder_q.backbone.conv.weight.detach().numpy().copy()
    ref_wk = ref_model.encoder_k.backbone.conv.weight.detach().numpy().copy()

    hp = SSLHyperParams.for_variant(
        PretrainType.PROPOSED_V2, dim=V_DIM, queue_len=V_K,
        use_symmetrical_loss=True,
    )
    model = make_trainable_densecl_stub(
        stub_conv_weights(V_SEED, V_DIM, HW_D // 4),
        stub_conv_weights(V_SEED + 1, 2048, BOS),
        HW_D // 4, BOS, V_DIM,
    )
    our_losses, state = _jax_trajectory_steps(
        model, hp, batches, HW_D, BOS, {"neck": neck0}
    )

    np.testing.assert_allclose(our_losses, ref_losses, rtol=1e-3)
    our_wq = np.asarray(state.params["backbone_kernel"]).transpose(3, 2, 0, 1)
    our_wk = np.asarray(
        state.ema_params["backbone_kernel"]).transpose(3, 2, 0, 1)
    np.testing.assert_allclose(our_wq, ref_wq, rtol=2e-3, atol=1e-6)
    np.testing.assert_allclose(our_wk, ref_wk, rtol=2e-3, atol=1e-6)
    # the parity-alternating queue updates must leave BOTH queues equal
    np.testing.assert_allclose(
        np.asarray(state.queue),
        ref_model.queue.detach().numpy().T, rtol=1e-3, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(state.queue2),
        ref_model.queue2.detach().numpy().T, rtol=1e-3, atol=1e-5,
    )
    assert int(state.queue_ptr) == int(ref_model.queue_ptr.item()) % V_K


@pytest.mark.slow
def test_proposed_weighted_training_trajectory_matches_reference():
    """PROPOSED + PIXEL_REGION_ID correspondence weights (3/2/0.5): the
    weighted dense loss (builder.py:1204-1243) shapes different gradients
    than CP2, so this pins a second dynamics regime."""
    from cp2_tpu.types import MappingType

    kwargs = dict(
        lmbd_pixel_corr_weight=3.0,
        lmbd_region_corr_weight=2.0,
        lmbd_not_corr_weight=0.5,
    )
    batches = _batches()
    ref_losses, ref_wq, ref_wk = _run_reference_trajectory(
        batches, pretrain_type="PROPOSED", mapping_type="PIXEL_REGION_ID",
        **kwargs,
    )
    hp = SSLHyperParams.for_variant(
        PretrainType.PROPOSED, dim=DIM, queue_len=K,
        mapping_type=MappingType.PIXEL_REGION_ID, **kwargs,
    )
    our_losses, our_wq, our_wk = _run_ours_trajectory(batches, hp)
    np.testing.assert_allclose(our_losses, ref_losses, rtol=1e-3)
    np.testing.assert_allclose(our_wq, ref_wq, rtol=2e-3, atol=1e-6)
    np.testing.assert_allclose(our_wk, ref_wk, rtol=2e-3, atol=1e-6)
