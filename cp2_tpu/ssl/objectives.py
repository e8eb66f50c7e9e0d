"""SSL objectives: CP2, MoCo-v2, BYOL, DenseCL / PROPOSED_V2.

Functional re-design of the reference's four forward variants
(builder.py:651-1606).  Key structural differences from the reference:

* the key (EMA) path is computed OUTSIDE the autodiff closure — it never
  depends on online params, so excluding it from the grad graph halves
  activation memory with no semantic change (the reference wraps it in
  ``torch.no_grad``, builder.py:1271-1285).
* dynamic boolean indexing becomes fixed-shape masked arithmetic
  (``negative_reshape``, coordinate blending) so the whole step jits.
* shuffle-BN (builder.py:609-649) is unnecessary: under global-view jit
  the key encoder's batch statistics are computed over the global batch
  (SyncBN semantics), which removes the per-device stat leakage that
  shuffle-BN works around.  Deviation documented; validated against the
  reference loss curves per SURVEY §7.3.

Each objective returns ``(loss, aux)`` where aux carries mutated BN
collections, keys to enqueue, and the metric scalars the reference logs
(same wandb key names).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from cp2_tpu.ops.correlation import (
    dense_loss_stats,
    get_correlation_map,
    get_masked_correlation_map,
)
from cp2_tpu.ops.losses import (
    byol_loss,
    cp2_dense_loss,
    info_nce,
    l2_normalize,
    moco_logits,
    negative_reshape,
    row_quantiles_linear,
    topk_accuracy,
)
from cp2_tpu.ssl.hparams import SSLHyperParams
from cp2_tpu.types import MappingType, NegativeType, PretrainType


def subsample_grid(x: jax.Array, stride: int) -> jax.Array:
    """Strided half-offset subsample to the feature grid (builder.py:1155-1186)."""
    return x[:, stride // 2 :: stride, stride // 2 :: stride]


def composite_foreground(img: jax.Array, bg: jax.Array):
    """Copy-paste: foreground shows through where bg was erased to zero.

    Reference builder.py:1146-1152 — the background stream erased a random
    rectangle to exactly 0; the mask is re-derived from channel 0.
    Returns (composited image, foreground mask at input resolution).
    """
    mask = (bg[..., 0] == 0).astype(img.dtype)  # (N, H, W)
    return img * mask[..., None] + bg, mask


# ---------------------------------------------------------------------------
# CP2 / PROPOSED
# ---------------------------------------------------------------------------

def cp2_objective(
    model,
    params,
    batch_stats,
    key_feats: jax.Array,
    batch: Dict[str, jax.Array],
    queue: jax.Array,
    hp: SSLHyperParams,
    output_stride: int,
    *,
    rngs: Optional[dict] = None,
    metrics_level: int = 1,
    epoch_scalars: bool = False,
) -> Tuple[jax.Array, Dict[str, Any]]:
    """Dense + instance contrastive loss on composited crops.

    ``epoch_scalars`` computes ONLY the cheap ``train/*`` family even at
    metrics_level 0 — the scalars the reference averages into its epoch
    aggregates every step (builder.py:1608-1664); the expensive quartile
    ``step/*`` stats stay gated on metrics_level (the reference does NOT
    epoch-aggregate those).

    ``key_feats`` is the key encoder's dense output on the composited
    img_b (already stop-gradient).  Reference: builder.py:1124-1606.
    """
    img_a, mask_a_full = composite_foreground(batch["img_a"], batch["bg0"])
    _, mask_b_full = composite_foreground(batch["img_b"], batch["bg1"])
    n = img_a.shape[0]

    os_ = output_stride
    mask_a = subsample_grid(mask_a_full, os_)
    mask_b = subsample_grid(mask_b_full, os_)
    pixel_ids_a = subsample_grid(batch["pixel_ids_a"], os_)
    pixel_ids_b = subsample_grid(batch["pixel_ids_b"], os_)
    region_ids_a = subsample_grid(batch["region_ids_a"], os_)
    region_ids_b = subsample_grid(batch["region_ids_b"], os_)

    # correspondence maps + weights (builder.py:1204-1243).  Under
    # MappingType.CP2 region ids ARE the pixel ids (loader.py:84-85), so the
    # second correspondence computation is shared instead of recomputed.
    # With unit weights (the CP2 default) the weight mask is exactly 1
    # everywhere, so when correspondence metrics aren't requested the whole
    # computation is elided.
    unit_weights = (
        hp.lmbd_pixel_corr_weight == 1
        and hp.lmbd_region_corr_weight == 1
        and hp.lmbd_not_corr_weight == 1
    )
    need_corr = (not unit_weights) or metrics_level >= 1
    pixel_corr = region_corr = None
    corr_weights = None
    if need_corr:
        pixel_corr = get_masked_correlation_map(
            pixel_ids_a.astype(jnp.float32), pixel_ids_b.astype(jnp.float32),
            mask_a, mask_b,
        )
        if hp.mapping_type == MappingType.CP2:
            region_corr = pixel_corr
        else:
            region_corr = get_masked_correlation_map(
                region_ids_a.astype(jnp.float32), region_ids_b.astype(jnp.float32),
                mask_a, mask_b,
            )
    if not unit_weights:
        region_map = region_corr["corr_map"]
        # id 0 marks unknown regions in SAM maps — exclude those pairs
        known = (
            region_ids_a.reshape(n, -1)[:, :, None]
            * region_ids_b.reshape(n, -1)[:, None, :]
        ).astype(bool)
        region_map = region_map & known

        corr_weights = hp.lmbd_region_corr_weight * region_map.astype(jnp.float32)
        corr_weights = jnp.where(
            pixel_corr["corr_map"], hp.lmbd_pixel_corr_weight, corr_weights
        )
        corr_weights = corr_weights + (corr_weights == 0) * hp.lmbd_not_corr_weight

    flat_mask_a = mask_a.reshape(n, -1)
    flat_mask_b = mask_b.reshape(n, -1)

    # query path (builder.py:1259-1268)
    q = model.apply(
        {"params": params, "batch_stats": batch_stats},
        img_a,
        train=True,
        mutable=["batch_stats"],
        rngs=rngs,
        method="dense",
    )
    q_out, q_mutated = q
    s2 = q_out.shape[1] * q_out.shape[2]
    q_dense = l2_normalize(
        q_out.reshape(n, s2, -1).astype(jnp.float32), axis=-1
    )
    q_pos = l2_normalize(jnp.einsum("nxc,nx->nc", q_dense, flat_mask_a), axis=-1)
    q_neg = l2_normalize(
        jnp.einsum("nxc,nx->nc", q_dense, 1.0 - flat_mask_a), axis=-1
    )

    # key path outputs, pre-computed (builder.py:1271-1285)
    k_dense = l2_normalize(
        key_feats.reshape(n, s2, -1).astype(jnp.float32), axis=-1
    )
    k_dense = jax.lax.stop_gradient(k_dense)
    k_pos = l2_normalize(jnp.einsum("nxc,nx->nc", k_dense, flat_mask_b), axis=-1)
    k_neg = l2_normalize(
        jnp.einsum("nxc,nx->nc", k_dense, 1.0 - flat_mask_b), axis=-1
    )

    # dense pairwise similarities (the attention-like hot op,
    # builder.py:1289).  A flash-style Pallas kernel for this object
    # exists (ops/pallas/dense_loss.py) but is a measured NEGATIVE
    # result in-step — the custom-VJP boundary blocks XLA fusion and the
    # loss is <1% of even a 512^2 step — so the step always uses the
    # fused-by-XLA einsum formulation (decision log in PARITY.md).
    metrics: Dict[str, jax.Array] = {}
    stats = None
    logits_dense = jnp.einsum("nxc,nyc->nxy", q_dense, k_dense)
    labels_dense = jnp.einsum("nx,ny->nxy", flat_mask_a, flat_mask_b)

    if metrics_level >= 1 or hp.negative_type in (
        NegativeType.AVERAGE,
        NegativeType.MEDIAN,
    ):
        stats = dense_loss_stats(logits_dense, labels_dense)

    logits_dense = negative_reshape(
        logits_dense,
        labels_dense,
        hp.negative_type.name,
        hp.negative_scale,
        negative_average=None if stats is None else stats["negative"]["average"],
        negative_median=None if stats is None else stats["negative"]["quartiles"][1],
    )
    if corr_weights is not None:
        logits_dense = logits_dense * corr_weights

    # instance (MoCo) logits against the queue (builder.py:1394-1423)
    l_pos, l_neg = moco_logits(q_pos, k_pos, queue)
    cols = [l_pos, l_neg]
    if hp.include_background:
        cols.append(jnp.einsum("nc,nc->n", q_pos, q_neg)[:, None])
        cols.append(jnp.einsum("nc,nc->n", q_pos, k_neg)[:, None])
    logits_moco = jnp.concatenate(cols, axis=1) / hp.instance_logits_temp
    labels_moco = jnp.zeros((n,), jnp.int32)
    loss_instance = -jnp.mean(jax.nn.log_softmax(logits_moco, axis=1)[:, 0])

    loss_dense = cp2_dense_loss(logits_dense, labels_dense, hp.dense_logits_temp)
    loss = loss_instance + loss_dense * hp.lmbd_cp2_dense_loss

    if metrics_level >= 1 or epoch_scalars:
        acc1, acc5 = topk_accuracy(logits_moco, labels_moco, ks=(1, 5))
        scaled = logits_dense / hp.dense_logits_temp
        top_pair = jnp.argmax(scaled.reshape(n, -1), axis=1)
        flat_labels = labels_dense.reshape(n, -1)
        acc_dense = jnp.mean(flat_labels[jnp.arange(n), top_pair]) * 100.0
        metrics.update(
            {
                "train/loss_step": loss,
                "train/loss_ins_step": loss_instance,
                "train/loss_dense_step": loss_dense,
                "train/acc_ins_step": acc1,
                "train/acc_seg_step": acc_dense,
                "train/cross_image_variance_source_step": jnp.std(q_pos, axis=0).mean(),
                "train/cross_image_variance_target_step": jnp.std(k_pos, axis=0).mean(),
            }
        )
    if metrics_level >= 1:
        if region_corr is not None:
            metrics["step/average_iou"] = region_corr["iou"].mean()
            metrics["step/average_masked_iou"] = region_corr["iou_masked"].mean()
        if stats is not None:
            metrics.update(_dense_stat_metrics(stats))
            metrics.update(_instance_stat_metrics(l_pos, l_neg))

    if metrics_level >= 2:
        # array payloads for the epoch-start visual artifacts (reference
        # builder.py:1441-1549: example grids, IoU histograms, similarity
        # heatmaps); the CLI filters keys starting with "_visual/" out of
        # the scalar sink and renders them to PNGs instead
        metrics["_visual/logits_dense"] = logits_dense
        metrics["_visual/mask_a"] = flat_mask_a
        metrics["_visual/mask_b"] = flat_mask_b
        metrics["_visual/img_a"] = img_a
        metrics["_visual/img_b"] = batch["img_b"] * (
            (batch["bg1"][..., 0] == 0)[..., None].astype(batch["img_b"].dtype)
        ) + batch["bg1"]
        if region_corr is not None:
            metrics["_visual/ious"] = region_corr["iou"]
            metrics["_visual/ious_masked"] = region_corr["iou_masked"]

    aux = {
        "mutated": q_mutated,
        "enqueue": {"queue": k_pos},
        "metrics": metrics,
        "ious": None if region_corr is None else region_corr["iou"],
        "ious_masked": None if region_corr is None else region_corr["iou_masked"],
    }
    return loss, aux


def cp2_key_forward(model, ema_params, ema_batch_stats, batch):
    """Key-encoder dense forward on the composited img_b (no grad)."""
    img_b, _ = composite_foreground(batch["img_b"], batch["bg1"])
    out, mutated = model.apply(
        {"params": ema_params, "batch_stats": ema_batch_stats},
        img_b,
        train=True,
        mutable=["batch_stats"],
        method="dense",
    )
    return jax.lax.stop_gradient(out), mutated


# ---------------------------------------------------------------------------
# MoCo-v2
# ---------------------------------------------------------------------------

def moco_key_forward(model, ema_params, ema_batch_stats, batch):
    out, mutated = model.apply(
        {"params": ema_params, "batch_stats": ema_batch_stats},
        batch["img_b"],
        train=True,
        mutable=["batch_stats"],
        method="global_embed",
    )
    return jax.lax.stop_gradient(l2_normalize(out.astype(jnp.float32))), mutated


def moco_objective(
    model, params, batch_stats, key_embed, batch, queue, hp,
    *, rngs=None, metrics_level: int = 1, epoch_scalars: bool = False,
):
    """Image-level InfoNCE against the queue (builder.py:1001-1077)."""
    q, mutated = model.apply(
        {"params": params, "batch_stats": batch_stats},
        batch["img_a"],
        train=True,
        mutable=["batch_stats"],
        rngs=rngs,
        method="global_embed",
    )
    q = l2_normalize(q.astype(jnp.float32))
    k = key_embed
    l_pos, l_neg = moco_logits(q, k, queue)
    logits = jnp.concatenate([l_pos, l_neg], axis=1) / hp.instance_logits_temp
    labels = jnp.zeros((q.shape[0],), jnp.int32)
    loss = -jnp.mean(jax.nn.log_softmax(logits, axis=1)[:, 0])

    metrics = {}
    if metrics_level >= 1 or epoch_scalars:
        acc1, acc5 = topk_accuracy(logits, labels, ks=(1, 5))
        metrics = {
            "train/loss_step": loss,
            "train/acc_ins_step": acc1,
        }
    if metrics_level >= 1:
        metrics.update(_instance_stat_metrics(l_pos, l_neg))
    return loss, {"mutated": mutated, "enqueue": {"queue": k}, "metrics": metrics}


# ---------------------------------------------------------------------------
# BYOL
# ---------------------------------------------------------------------------

def byol_key_forward(model, ema_params, ema_batch_stats, batch):
    outs = []
    stats = ema_batch_stats
    for key in ("img_a", "img_b"):
        out, mutated = model.apply(
            {"params": ema_params, "batch_stats": stats},
            batch[key],
            train=True,
            mutable=["batch_stats"],
            method="global_embed",
        )
        stats = mutated["batch_stats"]
        outs.append(jax.lax.stop_gradient(out.astype(jnp.float32)))
    return tuple(outs), {"batch_stats": stats}


def byol_objective(
    model, params, batch_stats, key_embeds, batch, queue, hp,
    *, rngs=None, metrics_level: int = 1, epoch_scalars: bool = False,
):
    """Symmetric predictor regression to the EMA targets (builder.py:1079-1122)."""
    k_a, k_b = key_embeds

    def online(img, stats):
        z, mutated = model.apply(
            {"params": params, "batch_stats": stats},
            img,
            train=True,
            mutable=["batch_stats"],
            rngs=rngs,
            method="global_embed",
        )
        p, mutated2 = model.apply(
            {"params": params, "batch_stats": mutated["batch_stats"]},
            z,
            train=True,
            mutable=["batch_stats"],
            rngs=rngs,
            method="predict",
        )
        return p.astype(jnp.float32), mutated2["batch_stats"]

    q_a, stats1 = online(batch["img_a"], batch_stats)
    q_b, stats2 = online(batch["img_b"], stats1)

    loss = jnp.mean(byol_loss(q_a, k_b) + byol_loss(q_b, k_a))
    metrics = (
        {"train/loss_step": loss}
        if (metrics_level >= 1 or epoch_scalars)
        else {}
    )
    return loss, {
        "mutated": {"batch_stats": stats2},
        "enqueue": {},
        "metrics": metrics,
    }


# ---------------------------------------------------------------------------
# DenseCL / PROPOSED_V2
# ---------------------------------------------------------------------------

def densecl_key_forward(model, ema_params, ema_batch_stats, batch, hp,
                        ema_params_2=None):
    """Key projections for one or both images (symmetric loss).

    ``ema_params_2``: the reference updates the momentum encoder inside
    ``get_key_features`` (builder.py:723-726), so its symmetric mode runs
    direction 2 through a SECOND EMA application — pass those params here
    (the train step computes them)."""
    imgs = ["img_b"] + (["img_a"] if hp.use_symmetrical_loss else [])
    params_per_img = [ema_params, ema_params_2 or ema_params]
    outs = []
    stats = ema_batch_stats
    for key, p in zip(imgs, params_per_img):
        (proj, embd), mutated = model.apply(
            {"params": p, "batch_stats": stats},
            batch[key],
            train=True,
            mutable=["batch_stats"],
            method="densecl_embed",
        )
        stats = mutated["batch_stats"]
        outs.append(jax.lax.stop_gradient((proj, embd)))
    return outs, {"batch_stats": stats}


def _densecl_normalize(proj: dict, embd: jax.Array, use_predictor: bool,
                       use_avgpool_global: bool, is_key: bool):
    """Select + normalize the global/local projections (builder.py:700-758)."""
    n = embd.shape[0]
    if is_key:
        local = proj["x_local_proj"]
        glob = proj["x_avgpool_local_proj"] if use_avgpool_global else proj["x_global_proj"]
    else:
        local = proj["x_local_pred"] if use_predictor else proj["x_local_proj"]
        if use_avgpool_global:
            glob = proj["x_avgpool_local_pred"] if use_predictor else proj["x_avgpool_local_proj"]
        else:
            glob = proj["x_global_pred"] if use_predictor else proj["x_global_proj"]
    local = l2_normalize(
        local.reshape(n, -1, local.shape[-1]).astype(jnp.float32), axis=-1
    )  # (N, S^2, C)
    glob = l2_normalize(glob.astype(jnp.float32), axis=-1)
    embd_n = l2_normalize(
        embd.reshape(n, -1, embd.shape[-1]).astype(jnp.float32), axis=-1
    )
    pooled = l2_normalize(
        jnp.mean(proj["x_local_proj"].reshape(n, -1, local.shape[-1]), axis=1).astype(jnp.float32),
        axis=-1,
    )
    return glob, local, embd_n, pooled


def densecl_objective(
    model, params, batch_stats, key_outs, batch, queues, hp,
    backbone_output_stride: int,
    step: jax.Array,
    *, rngs=None, metrics_level: int = 1, epoch_scalars: bool = False,
):
    """Global + dense InfoNCE with similarity/coordinate positive matching.

    Reference builder.py:667-999.  ``queues`` is (queue, queue2).
    """
    queue, queue2 = queues
    bos = backbone_output_stride
    pixel_ids_a = subsample_grid(batch["pixel_ids_a"], bos).astype(jnp.float32)
    pixel_ids_b = subsample_grid(batch["pixel_ids_b"], bos).astype(jnp.float32)

    stats = batch_stats
    mutated = {"batch_stats": batch_stats}

    def query_feats(img, stats):
        (proj, embd), mut = model.apply(
            {"params": params, "batch_stats": stats},
            img,
            train=True,
            mutable=["batch_stats"],
            rngs=rngs,
            method="densecl_embed",
        )
        return proj, embd, mut["batch_stats"]

    def local_loss(q_embd, k_embd, q_local, k_local, ids_q, ids_k, log_metrics):
        # similarity-based positive matching (builder.py:817-835)
        backbone_sim = jnp.einsum("nxc,nyc->nxy", q_embd, k_embd)
        pos_idx = jnp.argmax(backbone_sim, axis=2)  # (N, S^2)
        local_sim = jnp.einsum("nxc,nyc->nxy", q_local, k_local)
        # row-select via fused compare-select-reduce: per-row gathers
        # serialize on TPU (see ops/seg_losses._pick_label_channel)
        hit = pos_idx[..., None] == jnp.arange(
            local_sim.shape[2], dtype=pos_idx.dtype
        )
        pos_local = jnp.sum(jnp.where(hit, local_sim, 0.0), axis=2)

        # coordinate ground-truth blending (builder.py:838-855)
        corr = get_correlation_map(ids_q, ids_k)
        corr_map = jax.lax.stop_gradient(corr["corr_map"]).astype(jnp.float32)
        overlap = corr_map.sum(-1) > 0
        coord_scores = (local_sim * corr_map).sum(-1)
        pos_local = jnp.where(
            overlap,
            pos_local * (1.0 - hp.lmbd_coordinate) + coord_scores * hp.lmbd_coordinate,
            pos_local,
        )

        # diagnostic: argmax(sim) == argmax(coord) on overlap pixels
        corr_max = jnp.argmax(corr_map, axis=2)
        match = (corr_max == jnp.argmax(local_sim, axis=2)) & overlap
        any_overlap = overlap.sum() > 0
        matching_rate = jnp.where(
            any_overlap, match.sum() / jnp.maximum(overlap.sum(), 1), -1.0
        )

        n, s2, c = q_local.shape
        q_flat = q_local.reshape(n * s2, c)
        pos_flat = pos_local.reshape(n * s2, 1)
        neg_flat = jnp.einsum("nc,kc->nk", q_flat, jax.lax.stop_gradient(queue2))
        loss_local = info_nce(pos_flat, neg_flat, hp.dense_logits_temp)

        m = {}
        if log_metrics and metrics_level >= 1:
            m = {
                "step/average_iou": corr["iou"].mean(),
                "step/non_zero_iou_ratio": jnp.mean((corr["iou"] > 0).astype(jnp.float32)),
                "step/matching_positives_rate": matching_rate,
                "step/dense_average_positive_scores": pos_flat.mean(),
                "step/dense_average_negative_scores": neg_flat.mean(),
            }
        return loss_local, m

    # direction 1: a -> b
    proj_q1, embd_q1, stats = query_feats(batch["img_a"], stats)
    qg1, ql1, qe1, _ = _densecl_normalize(
        proj_q1, embd_q1, hp.use_predictor, hp.use_avgpool_global, is_key=False
    )
    kproj1, kembd1 = key_outs[0]
    kg1, kl1, ke1, kpool1 = _densecl_normalize(
        kproj1, kembd1, hp.use_predictor, hp.use_avgpool_global, is_key=True
    )
    l_pos1, l_neg1 = moco_logits(qg1, kg1, queue)
    loss_global = info_nce(l_pos1, l_neg1, hp.instance_logits_temp)
    loss_local, local_metrics = local_loss(
        qe1, ke1, ql1, kl1, pixel_ids_a, pixel_ids_b, log_metrics=True
    )

    enqueue_g, enqueue_l = kg1, kpool1

    if hp.use_symmetrical_loss:
        proj_q2, embd_q2, stats = query_feats(batch["img_b"], stats)
        qg2, ql2, qe2, _ = _densecl_normalize(
            proj_q2, embd_q2, hp.use_predictor, hp.use_avgpool_global, is_key=False
        )
        kproj2, kembd2 = key_outs[1]
        kg2, kl2, ke2, kpool2 = _densecl_normalize(
            kproj2, kembd2, hp.use_predictor, hp.use_avgpool_global, is_key=True
        )
        l_pos2, l_neg2 = moco_logits(qg2, kg2, queue)
        loss_global = loss_global + info_nce(l_pos2, l_neg2, hp.instance_logits_temp)
        loss_local2, _ = local_loss(
            qe2, ke2, ql2, kl2, pixel_ids_b, pixel_ids_a, log_metrics=False
        )
        loss_local = loss_local + loss_local2
        # alternate queue source by step parity (builder.py:966-972)
        even = (step % 2) == 0
        enqueue_g = jnp.where(even, kg2, kg1)
        enqueue_l = jnp.where(even, kpool2, kpool1)

    loss = (1.0 - hp.lmbd_cp2_dense_loss) * loss_global + hp.lmbd_cp2_dense_loss * loss_local

    metrics = {}
    if metrics_level >= 1 or epoch_scalars:
        metrics = {
            "train/loss_step": loss,
            "train/loss_ins_step": loss_global,
            "train/loss_dense_step": loss_local,
            "step/cross_image_variance_source_step": jnp.std(qg1, axis=0).mean(),
            "step/cross_image_variance_target_step": jnp.std(kg1, axis=0).mean(),
        }
    if metrics_level >= 1:
        metrics.update(local_metrics)
        metrics.update(_instance_stat_metrics(l_pos1, l_neg1))

    return loss, {
        "mutated": {"batch_stats": stats},
        "enqueue": {"queue": enqueue_g, "queue2": enqueue_l},
        "metrics": metrics,
    }


# ---------------------------------------------------------------------------
# metric helpers
# ---------------------------------------------------------------------------

def _instance_stat_metrics(l_pos, l_neg):
    q = row_quantiles_linear(l_neg, (0.25, 0.5, 0.75))
    return {
        "step/instance_average_positive_scores": l_pos.mean(),
        "step/instance_average_negative_scores": l_neg.mean(),
        "step/instance_lower_negative_scores": q[0].mean(),
        "step/instance_median_negative_scores": q[1].mean(),
        "step/instance_upper_negative_scores": q[2].mean(),
    }


def _dense_stat_metrics(stats):
    out = {}
    for side in ("positive", "negative"):
        avg = stats[side]["average"]
        lo, med, hi = stats[side]["quartiles"]
        out[f"step/dense_per_sample_average_{side}_scores"] = jnp.nanmean(avg)
        out[f"step/dense_per_sample_lower_{side}_scores"] = jnp.nanmean(lo)
        out[f"step/dense_per_sample_median_{side}_scores"] = jnp.nanmean(med)
        out[f"step/dense_per_sample_upper_{side}_scores"] = jnp.nanmean(hi)
    out["train/+ive_scores_step"] = jnp.nanmean(stats["positive"]["average"])
    out["train/-ive_scores_step"] = jnp.nanmean(stats["negative"]["average"])
    return out
