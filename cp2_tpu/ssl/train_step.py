"""The pretrain step: one pure state transition, jitted end to end.

Replaces the reference's hot loop (main.py:572-654: H2D copies → DDP
forward with embedded collectives → backward allreduce → optimizer) with a
single donated-buffer jit: EMA update, key forward, query forward/backward,
optimizer update and queue enqueue all fuse into one XLA program; under a
data mesh the gradient reduction rides ICI automatically.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from cp2_tpu.ssl import objectives as obj
from cp2_tpu.ssl.hparams import SSLHyperParams
from cp2_tpu.ssl.queue import queue_enqueue
from cp2_tpu.ssl.state import PretrainState
from cp2_tpu.types import BackboneType, PretrainType


def backbone_output_stride_of(model_cfg: dict, backbone_type: BackboneType,
                              unet_truncated_dec_blocks: int = 2) -> int:
    if backbone_type == BackboneType.UNET_ENCODER_ONLY:
        return 32
    if backbone_type == BackboneType.UNET_TRUNCATED:
        return 32 >> unet_truncated_dec_blocks
    strides = model_cfg["backbone"].get("strides", (1, 2, 2, 2))
    return 4 * int(math.prod(strides))


def dense_output_stride_of(model_cfg: dict, backbone_type: BackboneType,
                           unet_truncated_dec_blocks: int = 2) -> int:
    """Output stride of the SSLEncoder 'dense' path for any backbone type.

    For DEEPLABV3 the head preserves the backbone grid; the U-Net variants
    set their own (reference probes this at runtime, builder.py:392-402).
    """
    if backbone_type == BackboneType.DEEPLABV3:
        strides = model_cfg["backbone"].get("strides", (1, 2, 2, 2))
        return 4 * int(math.prod(strides))
    return backbone_output_stride_of(model_cfg, backbone_type,
                                     unet_truncated_dec_blocks)


# Per-variant epoch-aggregate families (reference on_train_epoch_end,
# builder.py:1608-1664): epoch name -> candidate step-metric sources.
_EPOCH_SOURCES = {
    "train/loss": ("train/loss_step",),
    "train/acc_ins": ("train/acc_ins_step",),
    "train/loss_ins": ("train/loss_ins_step",),
    "train/loss_dense": ("train/loss_dense_step",),
    "train/acc_seg": ("train/acc_seg_step",),
    "train/cross_image_variance_source": (
        "train/cross_image_variance_source_step",
        "step/cross_image_variance_source_step",
    ),
    "train/cross_image_variance_target": (
        "train/cross_image_variance_target_step",
        "step/cross_image_variance_target_step",
    ),
}


def epoch_scalar_names(pt: PretrainType) -> Tuple[str, ...]:
    """The scalars the reference averages over EVERY step into its epoch
    aggregates, per variant (builder.py:1608-1664)."""
    names = ["train/loss"]
    if pt in (PretrainType.MOCO, PretrainType.CP2, PretrainType.PROPOSED):
        names.append("train/acc_ins")
    if pt in (PretrainType.DENSECL, PretrainType.PROPOSED_V2,
              PretrainType.CP2):
        names += ["train/loss_ins", "train/loss_dense"]
    if pt in (PretrainType.PROPOSED_V2, PretrainType.CP2):
        names += ["train/cross_image_variance_source",
                  "train/cross_image_variance_target"]
    if pt == PretrainType.CP2:
        names.append("train/acc_seg")
    return tuple(names)


def make_pretrain_step(
    model,
    tx: optax.GradientTransformation,
    hp: SSLHyperParams,
    output_stride: int,
    backbone_output_stride: int,
    *,
    metrics_level: int = 1,
    epoch_scalars: bool = False,
    augment_fn: Callable | None = None,
) -> Callable[[PretrainState, Dict[str, jax.Array], jax.Array],
              Tuple[PretrainState, Dict[str, jax.Array]]]:
    """Build the (unjitted) step function for the configured variant.

    ``augment_fn(rng, batch) -> batch`` optionally runs the fused on-device
    augmentation inside the same XLA program as the model step.

    ``epoch_scalars=True`` makes EVERY step (metrics_level 0 included)
    also return ``metrics["_epoch_vec"]`` — the variant's epoch-aggregate
    family packed into one vector in ``epoch_scalar_names(pt)`` order, so
    the training loop can keep exact reference epoch means
    (builder.py:1608-1664 averages every step) with a single on-device
    add per step.  Only cheap scalars are involved (loss components,
    accuracies, cross-image variance) — the quartile sorts stay gated on
    metrics_level.
    """
    pt = hp.pretrain_type

    def step_fn(state: PretrainState, batch, rng):
        # derive per-step randomness ON DEVICE from the step counter: callers
        # pass one fixed base key for the whole run, so the host never
        # builds/transfers keys per step (each host-side PRNGKey(i) showed up
        # as its own tiny threefry dispatch between steps in the profile)
        rng = jax.random.fold_in(rng, state.step)
        aug_rng, dropout_rng = jax.random.split(rng)
        if augment_fn is not None:
            batch = augment_fn(aug_rng, batch)
        rngs = {"dropout": dropout_rng}

        # momentum update BEFORE the key forward (builder.py:726,1272)
        state = state.ema_update(hp.momentum)

        if pt in (PretrainType.CP2, PretrainType.PROPOSED):
            key_out, key_mut = obj.cp2_key_forward(
                model, state.ema_params, state.ema_batch_stats, batch
            )

            def loss_fn(params):
                return obj.cp2_objective(
                    model, params, state.batch_stats, key_out, batch,
                    state.queue, hp, output_stride,
                    rngs=rngs, metrics_level=metrics_level,
                    epoch_scalars=epoch_scalars,
                )

        elif pt == PretrainType.MOCO:
            key_out, key_mut = obj.moco_key_forward(
                model, state.ema_params, state.ema_batch_stats, batch
            )

            def loss_fn(params):
                return obj.moco_objective(
                    model, params, state.batch_stats, key_out, batch,
                    state.queue, hp, rngs=rngs, metrics_level=metrics_level,
                    epoch_scalars=epoch_scalars,
                )

        elif pt == PretrainType.BYOL:
            key_out, key_mut = obj.byol_key_forward(
                model, state.ema_params, state.ema_batch_stats, batch
            )

            def loss_fn(params):
                return obj.byol_objective(
                    model, params, state.batch_stats, key_out, batch,
                    state.queue, hp, rngs=rngs, metrics_level=metrics_level,
                    epoch_scalars=epoch_scalars,
                )

        elif pt in (PretrainType.DENSECL, PretrainType.PROPOSED_V2):
            # the reference's momentum update lives INSIDE get_key_features
            # (builder.py:723-726), so the symmetric mode applies the EMA
            # TWICE per step and the second direction's keys come from the
            # twice-updated encoder (builder.py:944-948)
            ema_params_1, ema_params_2 = state.ema_params, None
            if hp.use_symmetrical_loss:
                state = state.ema_update(hp.momentum)
                ema_params_2 = state.ema_params
            key_out, key_mut = obj.densecl_key_forward(
                model, ema_params_1, state.ema_batch_stats, batch, hp,
                ema_params_2=ema_params_2,
            )

            def loss_fn(params):
                return obj.densecl_objective(
                    model, params, state.batch_stats, key_out, batch,
                    (state.queue, state.queue2), hp, backbone_output_stride,
                    state.step, rngs=rngs, metrics_level=metrics_level,
                    epoch_scalars=epoch_scalars,
                )

        else:
            raise NotImplementedError(f"pretrain_type={pt}")

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        queue, queue_ptr = state.queue, state.queue_ptr
        queue2, queue2_ptr = state.queue2, state.queue2_ptr
        enq = aux["enqueue"]
        if "queue" in enq:
            queue, queue_ptr = queue_enqueue(queue, queue_ptr, enq["queue"])
        if "queue2" in enq:
            queue2, queue2_ptr = queue_enqueue(queue2, queue2_ptr, enq["queue2"])

        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=aux["mutated"]["batch_stats"],
            ema_batch_stats=key_mut["batch_stats"],
            opt_state=new_opt_state,
            queue=queue,
            queue_ptr=queue_ptr,
            queue2=queue2,
            queue2_ptr=queue2_ptr,
        )
        metrics = dict(aux["metrics"])
        metrics["loss"] = loss
        if epoch_scalars:
            vec = []
            for name in epoch_scalar_names(pt):
                for src in _EPOCH_SOURCES[name]:
                    if src in metrics:
                        vec.append(metrics[src].astype(jnp.float32))
                        break
                else:
                    raise KeyError(
                        f"epoch scalar {name} has no source in step metrics"
                    )
            metrics["_epoch_vec"] = jnp.stack(vec)
        return new_state, metrics

    return step_fn


def cosine_lr_schedule(base_lr: float, epochs: int, steps_per_epoch: int):
    """Per-epoch cosine decay (reference adjust_learning_rate, main.py:693-698)."""

    def schedule(step):
        epoch = step // max(steps_per_epoch, 1)
        return base_lr * 0.5 * (1.0 + jnp.cos(jnp.pi * epoch / epochs))

    return schedule


def make_optimizer(
    optim: str,
    lr,
    *,
    momentum: float = 0.9,
    weight_decay: float = 1e-4,
) -> optax.GradientTransformation:
    """SGD+momentum / AdamW, matching the reference's two options
    (main.py:467-477)."""
    if optim == "sgd":
        return optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.sgd(lr, momentum=momentum),
        )
    if optim == "adamw":
        return optax.adamw(lr, weight_decay=0.01)
    raise NotImplementedError("Only sgd and adamw optimizers are supported.")
