"""CutPaste/"mirror" pretext task steps.

Functional re-design of the reference ``MirrorModule``
(networks/mirror_network.py:8-86): per batch, forward the image and its
"mirror" (same pasted patch on a different base image), supervise both
with the patch mask (CE), and add a temperature-softened consistency loss
between the two predictions.

Consistency-loss fidelity note: the reference passes *probabilities* into
``nn.CrossEntropyLoss`` (mirror_network.py:49-52), which log-softmaxes its
input again — so the effective loss is
``-Σ softmax(t/T) · log_softmax(softmax(s/T))``.  Reproduced literally.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import optax

from cp2_tpu.ops.losses import softmax_cross_entropy
from cp2_tpu.ops.metrics import ConfusionState
from cp2_tpu.train.segmentation_task import SegTrainState, seg_forward
from cp2_tpu.types import MirrorVariant


def mirror_consistency_loss(
    s_logits, t_logits, temperature: float, sample_mask=None
):
    s_probs = jax.nn.softmax(s_logits / temperature, axis=-1)
    t_probs = jax.nn.softmax(t_logits / temperature, axis=-1)
    log_q = jax.nn.log_softmax(s_probs, axis=-1)  # literal reference behavior
    ce = -jnp.sum(t_probs * log_q, axis=-1)
    if sample_mask is None:
        return jnp.mean(ce)
    w = sample_mask.reshape((-1,) + (1,) * (ce.ndim - 1))
    return jnp.sum(ce * w) / jnp.maximum(
        w.sum() * (ce.size // ce.shape[0]), 1
    )


def make_mirror_steps(
    model,
    tx: optax.GradientTransformation,
    num_classes: int,
    image_hw: Tuple[int, int],
    *,
    mirror_variant: MirrorVariant = MirrorVariant.OUTPUT,
    lmbd_compare_loss: float = 0.01,
    softmax_temp: float = 2.0,
):
    def train_step(state: SegTrainState, batch, rng, confusion: ConfusionState):
        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            if mirror_variant == MirrorVariant.OUTPUT:
                s_logits, _, mutated = seg_forward(
                    model, variables, batch["image"], image_hw,
                    train=True, rngs={"dropout": rng}, mutable=True,
                )
                variables2 = {"params": params, "batch_stats": mutated["batch_stats"]}
                t_logits, _, mutated = seg_forward(
                    model, variables2, batch["mirror"], image_hw,
                    train=True, rngs={"dropout": rng}, mutable=True,
                )
                all_logits = jnp.concatenate([s_logits, t_logits])
                all_masks = jnp.concatenate([batch["mask"], batch["mask"]])
                compare = mirror_consistency_loss(s_logits, t_logits, softmax_temp)
            else:
                all_logits, _, mutated = seg_forward(
                    model, variables, batch["image"], image_hw,
                    train=True, rngs={"dropout": rng}, mutable=True,
                )
                all_masks = batch["mask"]
                compare = 0.0
            class_loss = softmax_cross_entropy(all_logits, all_masks)
            loss = class_loss + lmbd_compare_loss * compare
            preds = jnp.argmax(all_logits, axis=-1)
            return loss, (preds, all_masks, mutated, class_loss, compare)

        (loss, (preds, masks, mutated, class_loss, compare)), grads = (
            jax.value_and_grad(loss_fn, has_aux=True)(state.params)
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
        metrics = {
            "train_loss": loss,
            "train_class_loss": class_loss,
            "train_compare_loss": compare,
        }
        return new_state, confusion, metrics

    def eval_step(state: SegTrainState, batch, confusion: ConfusionState):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        # per-row pad mask from drop_last=False loaders (see seg eval_step)
        row_mask = batch.get("valid")
        if mirror_variant == MirrorVariant.OUTPUT:
            s_logits, _, _ = seg_forward(
                model, variables, batch["image"], image_hw, train=False
            )
            t_logits, _, _ = seg_forward(
                model, variables, batch["mirror"], image_hw, train=False
            )
            all_logits = jnp.concatenate([s_logits, t_logits])
            all_masks = jnp.concatenate([batch["mask"], batch["mask"]])
            all_row_mask = (
                None if row_mask is None
                else jnp.concatenate([row_mask, row_mask])
            )
            compare = mirror_consistency_loss(
                s_logits, t_logits, softmax_temp, sample_mask=row_mask
            )
        else:
            all_logits, _, _ = seg_forward(
                model, variables, batch["image"], image_hw, train=False
            )
            all_masks = batch["mask"]
            all_row_mask = row_mask
            compare = 0.0
        class_loss = softmax_cross_entropy(
            all_logits, all_masks, sample_mask=all_row_mask
        )
        loss = class_loss + lmbd_compare_loss * compare
        preds = jnp.argmax(all_logits, axis=-1)
        n = batch["image"].shape[0]
        weight = (
            jnp.float32(n) if row_mask is None
            else row_mask.sum().astype(jnp.float32)
        )
        return (
            confusion.update(preds, all_masks, sample_mask=all_row_mask),
            {"val_loss": loss, "weight": weight},
        )

    return train_step, eval_step
