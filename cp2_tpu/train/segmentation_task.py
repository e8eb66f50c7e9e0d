"""Supervised segmentation task: train/eval steps + state.

Functional re-design of the reference's Lightning ``SegmentationModule``
(networks/segment_network.py:48-309): forward → bilinear-resize logits to
label resolution → mean CE → metric update, Adam optimizer.  Metrics are
on-device confusion accumulators carried in the train state (one psum
replaces torchmetrics' sync_dist).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax.struct import dataclass as flax_dataclass

from cp2_tpu.ops.losses import softmax_cross_entropy
from cp2_tpu.ops.metrics import ConfusionState, compute_metrics
from cp2_tpu.ops.resize import resize_bilinear

BACKGROUND_CLASS = 0


@flax_dataclass
class SegTrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


def create_seg_state(
    rng: jax.Array, model, tx: optax.GradientTransformation, sample: jax.Array,
    init_params: Any = None, init_batch_stats: Any = None,
) -> SegTrainState:
    # flax only materializes params for called submodules: run the aux head
    # during init when the segmentor has one, else its params never exist
    init_kwargs = (
        {"with_aux": True}
        if getattr(model, "auxiliary_head", None) is not None
        else {}
    )
    variables = model.init(rng, sample, train=False, **init_kwargs)
    params = init_params if init_params is not None else variables["params"]
    batch_stats = (
        init_batch_stats if init_batch_stats is not None
        else variables.get("batch_stats", {})
    )
    return SegTrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
    )


def seg_forward(model, variables, images, image_hw, *, train: bool, rngs=None,
                mutable=False, with_aux: bool = False):
    """Logits at label resolution + argmax prediction
    (reference segment_network.py:219-231).  With ``with_aux`` also
    returns the auxiliary head's resized logits (mmseg
    ``_auxiliary_head_forward_train`` semantics)."""
    out = model.apply(
        variables, images, train=train,
        mutable=["batch_stats"] if mutable else False,
        rngs=rngs, with_aux=with_aux,
    )
    if mutable:
        logits, mutated = out
    else:
        logits, mutated = out, None
    aux_logits = None
    if with_aux:
        logits, aux_logits = logits
        aux_logits = resize_bilinear(aux_logits.astype(jnp.float32), image_hw)
    logits = resize_bilinear(logits.astype(jnp.float32), image_hw)
    preds = jnp.argmax(logits, axis=-1)
    if with_aux:
        return logits, aux_logits, preds, mutated
    return logits, preds, mutated


def build_decode_loss(decode_head_cfg: dict, *, ignore_index: int = 255):
    """Loss callable from ``decode_head.loss_decode`` (+ OHEM ``sampler``).

    mmseg semantics (``decode_head.py:222-242``): the configured loss runs
    on resized logits, optionally weighted by
    ``OHEMPixelSampler.sample`` (``ohem_pixel_sampler.py:9-76``).  Returns
    ``None`` when the config carries only the default mean CE — the
    Lightning finetune path computes its own CE
    (segment_network.py:169-171) and keeping that default preserves loss
    parity for the reference configs.

    The OHEM exclusion is applied by remapping dropped pixels to
    ``ignore_index`` before the loss, which composes with every registered
    loss (CE / Dice / Lovász) instead of only weight-aware ones.
    """
    from cp2_tpu.models.registry import LOSSES

    loss_cfg = dict(decode_head_cfg.get("loss_decode") or {})
    sampler_cfg = decode_head_cfg.get("sampler")
    default_ce = (
        loss_cfg.get("type", "CrossEntropyLoss") == "CrossEntropyLoss"
        and not loss_cfg.get("use_sigmoid", False)
        and float(loss_cfg.get("loss_weight", 1.0)) == 1.0
    )
    if default_ce and not sampler_cfg:
        return None

    ltype = loss_cfg.pop("type", "CrossEntropyLoss")
    loss_impl = LOSSES.get(ltype)
    kwargs = dict(loss_cfg)
    kwargs.setdefault("ignore_index", ignore_index)
    ohem = None
    if sampler_cfg:
        if sampler_cfg.get("type") != "OHEMPixelSampler":
            raise NotImplementedError(f"sampler {sampler_cfg.get('type')!r}")
        ohem = dict(
            thresh=sampler_cfg.get("thresh"),
            min_kept=int(sampler_cfg.get("min_kept", 100000)),
        )

    def loss_fn(logits, labels):
        from cp2_tpu.ops.seg_losses import ohem_weights

        if ohem is not None:
            # batch_kept = min_kept * N (reference ohem_pixel_sampler.py:46)
            w = ohem_weights(
                logits, labels,
                thresh=ohem["thresh"],
                min_kept=ohem["min_kept"] * labels.shape[0],
                ignore_index=ignore_index,
            )
            w = jax.lax.stop_gradient(w)
            labels = jnp.where(w > 0, labels, ignore_index)
        return loss_impl(logits, labels, **kwargs)

    return loss_fn


def make_seg_steps(
    model,
    tx: optax.GradientTransformation,
    num_classes: int,
    image_hw: Tuple[int, int],
    *,
    frozen_mask: Any = None,
    aux_loss_weight: float = 0.4,
    loss_fn: Optional[Callable] = None,
):
    """Build (train_step, eval_step).

    ``frozen_mask``: pytree of bools marking params to freeze
    (--linear_evaluation, reference finetune.py:219-222) — their gradients
    are zeroed, which composes with any optimizer.

    When the segmentor has an ``auxiliary_head``, its CE loss is added
    with ``aux_loss_weight`` during training only (mmseg
    ``encoder_decoder.forward_train`` + ``_auxiliary_head_forward_train``;
    0.4 is the standard mmseg aux weight).  Inference ignores it.

    ``loss_fn``: optional ``(logits, labels) -> loss`` built from the
    decode-head config (``build_decode_loss``: Dice/Lovász/OHEM); when
    None the reference finetune loss (plain mean CE) is used.
    """
    binary = num_classes == 2
    ignore = None if binary else BACKGROUND_CLASS
    has_aux = getattr(model, "auxiliary_head", None) is not None
    base_loss = (
        loss_fn if loss_fn is not None
        else lambda logits, labels: softmax_cross_entropy(logits, labels)
    )

    def train_step(state: SegTrainState, batch, rng, confusion: ConfusionState):
        images, masks = batch["image"], batch["mask"]

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            if has_aux:
                logits, aux_logits, preds, mutated = seg_forward(
                    model, variables, images, image_hw, train=True,
                    rngs={"dropout": rng}, mutable=True, with_aux=True,
                )
                loss = base_loss(logits, masks)
                loss = loss + aux_loss_weight * softmax_cross_entropy(
                    aux_logits, masks
                )
            else:
                logits, preds, mutated = seg_forward(
                    model, variables, images, image_hw, train=True,
                    rngs={"dropout": rng}, mutable=True,
                )
                loss = base_loss(logits, masks)
            return loss, (preds, mutated)

        (loss, (preds, mutated)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        if frozen_mask is not None:
            grads = jax.tree_util.tree_map(
                lambda g, f: jnp.where(f, jnp.zeros_like(g), g), grads, frozen_mask
            )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=mutated["batch_stats"],
            opt_state=new_opt,
        )
        confusion = confusion.update(preds, masks)
        return new_state, confusion, {"loss": loss}

    def eval_step(state: SegTrainState, batch, confusion: ConfusionState):
        images, masks = batch["image"], batch["mask"]
        n = images.shape[0]
        # loaders pad the final drop_last=False batch by repeating the last
        # sample; the per-row "valid" mask drops pad rows from both the
        # loss and the confusion counts
        row_mask = batch.get("valid")
        logits, preds, _ = seg_forward(
            model,
            {"params": state.params, "batch_stats": state.batch_stats},
            images, image_hw, train=False,
        )
        if loss_fn is None:
            loss = softmax_cross_entropy(logits, masks, sample_mask=row_mask)
        else:
            # custom decode losses don't take a row mask; excluding pad
            # rows via the loss's own ignore_index is equivalent
            masks_for_loss = masks
            if row_mask is not None:
                masks_for_loss = jnp.where(
                    row_mask.reshape((-1,) + (1,) * (masks.ndim - 1)),
                    masks, 255,
                )
            loss = loss_fn(logits, masks_for_loss)
        weight = (
            jnp.float32(n) if row_mask is None
            else row_mask.sum().astype(jnp.float32)
        )
        return (
            confusion.update(preds, masks, sample_mask=row_mask),
            {"loss": loss, "weight": weight},
        )

    def metrics_of(confusion: ConfusionState, prefix: str) -> Dict[str, jax.Array]:
        return compute_metrics(
            confusion, binary=binary, ignore_index=ignore, prefix=prefix
        )

    return train_step, eval_step, metrics_of
