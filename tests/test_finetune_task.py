"""Finetune slice: seg steps, metrics semantics, checkpoint conversion."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from cp2_tpu.models import build_segmentor
from cp2_tpu.ops.metrics import (
    ConfusionState,
    compute_metrics,
    eval_metrics,
    intersect_and_union,
)
from cp2_tpu.train.segmentation_task import create_seg_state, make_seg_steps

TINY_SEG = dict(
    type="EncoderDecoder",
    backbone=dict(
        type="ResNet",
        depth=18,
        stem_channels=8,
        base_channels=8,
        dilations=(1, 1, 1, 2),
        strides=(1, 2, 2, 1),
        norm_cfg=dict(type="BN"),
        contract_dilation=True,
    ),
    decode_head=dict(
        type="ASPPHead",
        in_channels=64,
        channels=16,
        dilations=(1, 6),
        num_classes=2,
        norm_cfg=dict(type="BN"),
    ),
)

HW = 32


@pytest.mark.slow
def test_seg_train_and_eval_step():
    model = build_segmentor({"model": TINY_SEG, "type": None} if False else TINY_SEG)
    tx = optax.adam(1e-3)
    sample = jnp.zeros((2, HW, HW, 3), jnp.float32)
    state = create_seg_state(jax.random.PRNGKey(0), model, tx, sample)
    train_step, eval_step, metrics_of = make_seg_steps(model, tx, 2, (HW, HW))

    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rng.rand(2, HW, HW, 3).astype(np.float32)),
        "mask": jnp.asarray((rng.rand(2, HW, HW) > 0.5).astype(np.int32)),
    }
    confusion = ConfusionState.create(2)
    jit_train = jax.jit(train_step)
    state1, confusion, m = jit_train(state, batch, jax.random.PRNGKey(1), confusion)
    assert np.isfinite(float(m["loss"]))
    assert int(state1.step) == 1

    confusion2, m2 = jax.jit(eval_step)(state1, batch, ConfusionState.create(2))
    out = metrics_of(confusion2, "val_")
    assert "val_BinaryJaccardIndex" in out and "val_Dice" in out
    assert 0.0 <= float(out["val_BinaryJaccardIndex"]) <= 1.0


@pytest.mark.slow
def test_eval_step_masks_padded_rows():
    """A padded eval batch (loader "valid" < N) must produce exactly the
    confusion counts and loss of the trimmed batch — pad rows are repeats
    of the last sample and would otherwise bias val/test IoU."""
    model = build_segmentor(TINY_SEG)
    tx = optax.adam(1e-3)
    sample = jnp.zeros((4, HW, HW, 3), jnp.float32)
    state = create_seg_state(jax.random.PRNGKey(0), model, tx, sample)
    _, eval_step, _ = make_seg_steps(model, tx, 2, (HW, HW))

    rng = np.random.RandomState(0)
    imgs = rng.rand(3, HW, HW, 3).astype(np.float32)
    masks = (rng.rand(3, HW, HW) > 0.5).astype(np.int32)
    # pad 3 -> 4 by repeating the last row, like the loaders do
    padded = {
        "image": jnp.asarray(np.concatenate([imgs, imgs[-1:]], 0)),
        "mask": jnp.asarray(np.concatenate([masks, masks[-1:]], 0)),
        "valid": jnp.arange(4) < 3,
    }
    conf_pad, m_pad = jax.jit(eval_step)(state, padded, ConfusionState.create(2))
    assert float(m_pad["weight"]) == 3.0

    # ground truth: per-sample eval of only the real rows (batch stats are
    # frozen at eval, so batching does not change the forward)
    conf_ref = ConfusionState.create(2)
    for i in range(3):
        one = {
            "image": jnp.asarray(np.stack([imgs[i]] * 1)),
            "mask": jnp.asarray(masks[i : i + 1]),
        }
        conf_ref, _ = jax.jit(eval_step)(state, one, conf_ref)
    np.testing.assert_allclose(
        np.asarray(conf_pad.matrix), np.asarray(conf_ref.matrix), rtol=0, atol=0.5
    )


@pytest.mark.slow
def test_auxiliary_head_trains():
    """EncoderDecoder with an auxiliary FCN head: the aux CE joins the
    train loss (weight 0.4, mmseg _auxiliary_head_forward_train) and the
    aux head's params receive gradient updates."""
    cfg = dict(
        TINY_SEG,
        auxiliary_head=dict(
            type="FCNHead",
            in_channels=32,   # stage 3 of the tiny ResNet-18
            in_index=2,
            channels=8,
            num_convs=1,
            num_classes=2,
            norm_cfg=dict(type="BN"),
        ),
    )
    model = build_segmentor(cfg)
    tx = optax.adam(1e-2)
    sample = jnp.zeros((2, HW, HW, 3), jnp.float32)
    state = create_seg_state(jax.random.PRNGKey(0), model, tx, sample)
    assert "auxiliary_head" in state.params
    train_step, _, _ = make_seg_steps(model, tx, 2, (HW, HW))

    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rng.rand(2, HW, HW, 3).astype(np.float32)),
        "mask": jnp.asarray((rng.rand(2, HW, HW) > 0.5).astype(np.int32)),
    }
    state1, _, m = jax.jit(train_step)(
        state, batch, jax.random.PRNGKey(1), ConfusionState.create(2)
    )
    assert np.isfinite(float(m["loss"]))
    moved = jax.tree_util.tree_reduce(
        lambda acc, x: acc + float(jnp.abs(x).sum()),
        jax.tree_util.tree_map(
            lambda a, b: a - b,
            state1.params["auxiliary_head"],
            state.params["auxiliary_head"],
        ),
        0.0,
    )
    assert moved > 0.0


def test_confusion_metrics_binary_hand_example():
    # preds:  [1,1,0,0], targets: [1,0,1,0] -> tp=1 fp=1 fn=1 tn=1
    state = ConfusionState.create(2).update(
        jnp.array([1, 1, 0, 0]), jnp.array([1, 0, 1, 0])
    )
    m = compute_metrics(state, binary=True, prefix="")
    assert float(m["BinaryJaccardIndex"]) == pytest.approx(1 / 3)
    assert float(m["Dice"]) == pytest.approx(0.5)
    assert float(m["BinaryPrecision"]) == pytest.approx(0.5)
    assert float(m["BinaryRecall"]) == pytest.approx(0.5)


def test_confusion_metrics_multiclass_ignores_background():
    preds = jnp.array([0, 1, 2, 2, 1])
    targets = jnp.array([0, 1, 2, 1, 0])
    state = ConfusionState.create(3).update(preds, targets)
    m = compute_metrics(state, binary=False, ignore_index=0, prefix="")
    # kept classes 1,2: tp = 2 (pred1/t1, pred2/t2); fn: t1 predicted 2 (1);
    # fp: pred1 on t0 (1), pred2 on t1 (1)
    assert float(m["MulticlassJaccardIndex"]) == pytest.approx(2 / (2 + 2 + 1))


def test_intersect_and_union_mmseg_semantics():
    pred = jnp.array([[0, 1], [1, 1]])
    label = jnp.array([[0, 1], [0, 1]])
    inter, union, parea, larea = intersect_and_union(pred, label, 2)
    np.testing.assert_array_equal(np.asarray(inter), [1, 2])
    np.testing.assert_array_equal(np.asarray(union), [2, 3])
    out = eval_metrics(inter, union, parea, larea, metrics=("mIoU", "mDice"))
    assert float(out["mIoU"]) == pytest.approx((1 / 2 + 2 / 3) / 2)


@pytest.mark.slow
def test_pretrain_checkpoint_grafts_into_segmentor():
    from cp2_tpu.checkpoint.convert import load_pretrained_into_segmentor
    from cp2_tpu.ssl import SSLEncoder
    from cp2_tpu.types import BackboneType, PretrainType

    pre_cfg = dict(TINY_SEG)
    pre_cfg["decode_head"] = dict(TINY_SEG["decode_head"], contrast=True, contrast_dim=8)
    ssl_model = SSLEncoder(
        model_cfg=pre_cfg, pretrain_type=PretrainType.CP2,
        backbone_type=BackboneType.DEEPLABV3, dim=8,
    )
    x = jnp.zeros((1, HW, HW, 3), jnp.float32)
    ssl_vars = ssl_model.init(jax.random.PRNGKey(7), x, method="init_all")
    ckpt_state = {
        "params": jax.device_get(ssl_vars["params"]),
        "batch_stats": jax.device_get(ssl_vars.get("batch_stats", {})),
    }

    ft_model = build_segmentor(TINY_SEG)
    ft_vars = dict(ft_model.init(jax.random.PRNGKey(8), x, train=False))
    before = np.asarray(
        ft_vars["params"]["backbone"]["conv1"]["conv"]["kernel"]
    ).copy()

    merged, report = load_pretrained_into_segmentor(
        ft_vars, ckpt_state, {"pretrain_type": "CP2"}, PretrainType.CP2
    )
    after = np.asarray(merged["params"]["backbone"]["conv1"]["conv"]["kernel"])
    src = np.asarray(
        ckpt_state["params"]["encoder"]["backbone"]["conv1"]["conv"]["kernel"]
    )
    assert not np.allclose(before, after)
    np.testing.assert_allclose(after, src)
    assert len(report["loaded"]) > 10

    # tag mismatch raises (segment_network.py:81-83)
    with pytest.raises(ValueError):
        load_pretrained_into_segmentor(
            ft_vars, ckpt_state, {"pretrain_type": "MOCO"}, PretrainType.CP2
        )

    # backbone-only restricts the graft
    merged2, report2 = load_pretrained_into_segmentor(
        ft_vars, ckpt_state, {"pretrain_type": "CP2"}, PretrainType.CP2,
        use_backbone_only=True,
    )
    assert all(k.startswith("backbone") for k in report2["loaded"])


def test_torchvision_resnet_conversion_layout():
    from cp2_tpu.checkpoint.convert import torchvision_resnet_to_flax

    sd = {
        "conv1.weight": np.zeros((64, 3, 7, 7), np.float32),
        "bn1.weight": np.ones((64,), np.float32),
        "bn1.running_mean": np.zeros((64,), np.float32),
        "layer1.0.conv2.weight": np.zeros((64, 64, 3, 3), np.float32),
        "layer1.0.bn3.running_var": np.ones((256,), np.float32),
        "layer1.0.downsample.0.weight": np.zeros((256, 64, 1, 1), np.float32),
        "layer1.0.downsample.1.bias": np.zeros((256,), np.float32),
        "fc.weight": np.zeros((1000, 2048), np.float32),  # ignored
    }
    params, stats = torchvision_resnet_to_flax(sd)
    assert params["conv1"]["conv"]["kernel"].shape == (7, 7, 3, 64)
    assert params["layer1_0"]["conv2"]["conv"]["kernel"].shape == (3, 3, 64, 64)
    assert stats["layer1_0"]["norm3"]["var"].shape == (256,)
    assert params["layer1_0"]["downsample"]["conv"]["kernel"].shape == (1, 1, 64, 256)
    assert "fc" not in params


@pytest.mark.slow
def test_ohem_dice_loss_decode_trains():
    """decode_head.loss_decode=DiceLoss + sampler=OHEMPixelSampler wired
    through build_decode_loss into the seg step (VERDICT r2 #7; mmseg
    decode_head.py:222-242 + ohem_pixel_sampler.py:9-76)."""
    from cp2_tpu.train.segmentation_task import build_decode_loss

    head_cfg = dict(
        TINY_SEG["decode_head"],
        loss_decode=dict(type="DiceLoss", loss_weight=1.0),
        sampler=dict(type="OHEMPixelSampler", thresh=0.7, min_kept=64),
    )
    loss_fn = build_decode_loss(head_cfg)
    assert loss_fn is not None
    # default CE config must stay on the reference loss path (None)
    assert build_decode_loss(TINY_SEG["decode_head"]) is None
    assert build_decode_loss(
        dict(TINY_SEG["decode_head"],
             loss_decode=dict(type="CrossEntropyLoss", loss_weight=1.0))
    ) is None

    model = build_segmentor(TINY_SEG)
    tx = optax.adam(1e-2)
    sample = jnp.zeros((2, HW, HW, 3), jnp.float32)
    state = create_seg_state(jax.random.PRNGKey(0), model, tx, sample)
    train_step, eval_step, _ = make_seg_steps(
        model, tx, 2, (HW, HW), loss_fn=loss_fn
    )
    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rng.rand(2, HW, HW, 3).astype(np.float32)),
        "mask": jnp.asarray((rng.rand(2, HW, HW) > 0.5).astype(np.int32)),
    }
    state1, _, m = jax.jit(train_step)(
        state, batch, jax.random.PRNGKey(1), ConfusionState.create(2)
    )
    assert np.isfinite(float(m["loss"]))
    assert 0.0 <= float(m["loss"]) <= 2.0  # Dice loss is bounded
    moved = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.abs(x).sum()),
        jax.tree_util.tree_map(
            lambda a, b: a - b, state1.params, state.params
        ),
        0.0,
    )
    assert moved > 0.0
    # eval path with a padded batch composes with the custom loss
    padded = dict(batch, valid=jnp.arange(2) < 1)
    _, me = jax.jit(eval_step)(state1, padded, ConfusionState.create(2))
    assert np.isfinite(float(me["loss"])) and float(me["weight"]) == 1.0


def test_ohem_weights_min_kept_and_thresh():
    """OHEM law: keeps at least min_kept lowest-confidence valid pixels;
    with thresh, everything below max(kth, thresh)."""
    from cp2_tpu.ops.seg_losses import ohem_weights

    r = np.random.RandomState(0)
    logits = jnp.asarray(r.randn(1, 8, 8, 2).astype(np.float32))
    labels = jnp.asarray((r.rand(1, 8, 8) > 0.5).astype(np.int32))
    w = ohem_weights(logits, labels, thresh=None, min_kept=10,
                     ignore_index=255)
    assert float(w.sum()) >= 10
    # dropped pixels all have higher true-class confidence than kept ones
    probs = jax.nn.softmax(logits, -1)
    conf = jnp.take_along_axis(probs, labels[..., None], -1)[..., 0]
    kept_max = float(jnp.where(w > 0, conf, -jnp.inf).max())
    drop_min = float(jnp.where(w == 0, conf, jnp.inf).min())
    assert kept_max <= drop_min + 1e-6
