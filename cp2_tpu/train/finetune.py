"""Supervised finetune entry point (CLI-compatible with finetune.py).

Replaces the reference's Lightning trainer (finetune.py:142-274) with an
explicit loop: jitted train step (device-side flips/jitter/noise fused
in), per-epoch val + pseudo-test evaluation, best-checkpoint selection by
``val_BinaryJaccardIndex`` (reference :164-171), and a final test pass on
the best weights (:257-274).

Run: ``python -m cp2_tpu.train.finetune --run_id r0 --log_dir /tmp/logs
--img_dirs <imgs> --mask_dirs <masks> --pretrain_type NONE ...``
"""

from __future__ import annotations

import argparse
import os
import time

from cp2_tpu.types import DataSplitType, PretrainType


def get_args(argv=None):
    parser = argparse.ArgumentParser()
    # fmt: off
    parser.add_argument('--config', default=None, help='path to model config')
    parser.add_argument('--seed', type=int, default=0)
    parser.add_argument('--run_id', type=str, required=True)
    parser.add_argument('--tags', nargs='+', default=[])
    parser.add_argument('--offline_wandb', action='store_true')
    parser.add_argument('--use_wandb', action='store_true')
    parser.add_argument('--use_backbone_only', action='store_true')

    parser.add_argument('--img_dirs', nargs='+', required=True)
    parser.add_argument('--mask_dirs', nargs='+', required=True)
    parser.add_argument('--train_data_ratio', type=float, default=1.0)
    parser.add_argument('--data_split_type', type=str,
                        choices=[x.name for x in DataSplitType],
                        default=DataSplitType.FILENAME.name)

    parser.add_argument('--log_dir', type=str, required=True)
    parser.add_argument('--wandb_project', type=str, default='ssl-pretraining')
    parser.add_argument('--wandb_team', type=str, default=None)
    parser.add_argument('--num_workers', type=int, default=4)
    parser.add_argument('--native_loader', action='store_true', default=True,
                        help='use the C++ decode pool when available')
    parser.add_argument('--no-native_loader', dest='native_loader',
                        action='store_false')
    parser.add_argument('--raw_cache_dir', type=str, default=None,
                        help='directory for the native raw-frame cache '
                             '(decode+SmallestMaxSize once, mmap after)')
    parser.add_argument('--fast_dev_run', action='store_true')
    parser.add_argument('--use_profiler', action='store_true')
    parser.add_argument('--prefetch_depth', default=2, type=int,
                        help='device-resident batches staged ahead by a '
                             'background thread (overlaps H2D of batch i+1 '
                             'with step i); 0 falls back to inline puts')

    parser.add_argument('--num_classes', type=int, default=2)
    parser.add_argument('--visualize_freq', type=int, default=10,
                        help='epochs between segmentation-overlay artifacts '
                             '(reference CustomCallback every_n_epochs=10); '
                             '0 disables')
    parser.add_argument('--lemon_data', action='store_true')
    parser.add_argument('--img_height', default=352, type=int)
    parser.add_argument('--img_width', default=352, type=int)

    parser.add_argument('--batch_size', type=int, default=16)
    parser.add_argument('--learning_rate', type=float, default=1e-4)
    parser.add_argument('--epochs', type=int, default=100)
    parser.add_argument('--weight_decay', type=float, default=1e-4)

    parser.add_argument('--pretrain_path', type=str, default='')
    parser.add_argument('--pretrain_type', type=str,
                        choices=[x.name for x in PretrainType], required=True)
    parser.add_argument('--linear_evaluation', action='store_true')
    parser.add_argument('--bf16', action='store_true', default=True)
    parser.add_argument('--no-bf16', dest='bf16', action='store_false')
    # fmt: on

    args = parser.parse_args(argv)
    if len(args.img_dirs) != 1 or len(args.mask_dirs) != 1:
        raise ValueError("exactly one image dir and one mask dir supported")
    args.pretrain_type = PretrainType[args.pretrain_type]
    args.data_split_type = DataSplitType[args.data_split_type]
    if args.lemon_data:
        args.img_height = 544
        args.img_width = 1024
        args.num_classes = 12
        args.epochs = 200
    if args.fast_dev_run:
        args.epochs = 1
    return args


def main(args):
    # Multi-host bootstrap first, before any JAX backend touch.
    from cp2_tpu.parallel.collectives import initialize as distributed_initialize

    distributed_initialize()

    # amortize the fused-step compile across CLI invocations (sweep legs
    # recompile identical programs otherwise; CP2_JAX_CACHE_DIR overrides)
    from cp2_tpu.utils import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    import cp2_tpu
    from cp2_tpu.augment import (
        FinetuneAugmentConfig,
        eval_augment_batch,
        finetune_augment_batch,
        lemon_augment_config,
    )
    from cp2_tpu.checkpoint import (
        latest_checkpoint,
        restore_checkpoint,
        save_checkpoint,
    )
    from cp2_tpu.checkpoint.convert import load_pretrained_into_segmentor
    from cp2_tpu.config import Config
    from cp2_tpu.data import HostDataLoader, SegmentationDataSource
    from cp2_tpu.data.datasets import (
        get_data_splits,
        list_image_mask_pairs,
        pseudo_test_subset,
    )
    from cp2_tpu.models import build_segmentor
    from cp2_tpu.ops.metrics import ConfusionState
    from cp2_tpu.parallel import create_mesh, shard_batch, shard_pytree
    from cp2_tpu.train.segmentation_task import (
        create_seg_state,
        make_seg_steps,
    )
    from cp2_tpu.utils import MetricLogger, seed_everything, setup_logger

    root_key = seed_everything(args.seed)
    run_dir = os.path.join(args.log_dir, args.run_id)
    os.makedirs(run_dir, exist_ok=True)
    logger = setup_logger("finetune", run_dir)
    sink = MetricLogger(
        args.log_dir, args.run_id, use_wandb=args.use_wandb,
        wandb_project=args.wandb_project, wandb_team=args.wandb_team,
        offline=args.offline_wandb, config={"hyper-parameters": vars(args)},
        tags=["finetune"] + args.tags,
    )

    # ---------------- data ----------------
    pairs = list_image_mask_pairs(args.img_dirs[0], args.mask_dirs[0])
    splits = get_data_splits(pairs, args.data_split_type, args.train_data_ratio)
    n_dev = jax.device_count()
    if not splits["train"]:
        raise ValueError("train split is empty — check --img_dirs/--mask_dirs")
    if args.batch_size > len(splits["train"]):
        # smoke runs hand in tiny datasets; a batch larger than the train
        # split would make the (drop_last) train loader yield zero steps
        eff = max(len(splits["train"]) // n_dev * n_dev, 1)
        logger.warning(
            f"batch_size {args.batch_size} > train split "
            f"{len(splits['train'])}; clamping to {eff}"
        )
        args.batch_size = eff
    # device-divisible pseudo-test subset; the reference divides by its GPU
    # count (finetune_dataset.py:194-207), here the mesh size
    pseudo = pseudo_test_subset(splits["test"], args.batch_size, n_dev)
    logger.info(
        f"splits: train={len(splits['train'])} val={len(splits['val'])} "
        f"test={len(splits['test'])} pseudo={len(pseudo)}"
    )
    hw = (args.img_height, args.img_width)
    if args.img_height != args.img_width and not args.lemon_data:
        raise ValueError("square images expected for polyp path")
    # lemon geometry is a direct aspect-breaking resize (reference
    # A.Resize(544, 1024), finetune_dataset.py:349-384) — no crop; polyp
    # is SmallestMaxSize + shared crop (:301-349)
    geometry = "resize" if args.lemon_data else "crop"

    # multi-host input sharding (reference DistributedSampler,
    # main.py:260-279): each process decodes only its rows of the global
    # batch; shard_batch assembles them into the global array
    shard = (jax.process_index(), jax.process_count())
    if args.batch_size % shard[1]:
        raise ValueError(
            f"batch_size {args.batch_size} not divisible by "
            f"{shard[1]} processes"
        )
    local_batch = args.batch_size // shard[1]

    if getattr(args, "raw_cache_dir", None):
        os.makedirs(args.raw_cache_dir, exist_ok=True)

    def loader(paths, random_crop, shuffle, seed=0):
        if getattr(args, "native_loader", False):
            try:
                from cp2_tpu.native import (
                    NativePairLoader,
                    default_cache_path,
                    native_available,
                )

                if native_available():
                    mode = "crop" if geometry == "crop" else "region"
                    cache = default_cache_path(
                        args.raw_cache_dir,
                        [p for pr in paths for p in pr], hw, mode,
                    ) if getattr(args, "raw_cache_dir", None) else None
                    return NativePairLoader(
                        paths, local_batch, hw, mode=mode,
                        random_crop=random_crop, num_classes=args.num_classes,
                        threads=max(args.num_workers, 1), seed=seed,
                        shuffle=shuffle, drop_last=shuffle, shard=shard,
                        cache_path=cache,
                    )
            except Exception as e:
                logger.info(f"native loader unavailable ({e}); using Python loader")
        src = SegmentationDataSource(
            paths, hw, args.num_classes, random_crop=random_crop, seed=seed,
            mode=geometry,
        )
        return HostDataLoader(
            src, local_batch, shuffle=shuffle, drop_last=shuffle, seed=seed,
            num_workers=args.num_workers, shard=shard,
        )

    train_loader = loader(splits["train"], True, True, args.seed)
    val_loader = loader(splits["val"], True, False, args.seed + 1)
    test_loader = loader(splits["test"], False, False, args.seed + 2)
    pseudo_loader = loader(pseudo, False, False, args.seed + 3)

    # ---------------- model ----------------
    config_path = args.config or os.path.join(
        os.path.dirname(cp2_tpu.__file__), "configs", "config_finetune.py"
    )
    cfg = Config.fromfile(config_path)
    cfg.model.decode_head.num_classes = args.num_classes
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    cfg.model["dtype"] = dtype
    model = build_segmentor(cfg)

    sample = jnp.zeros((args.batch_size,) + hw + (3,), jnp.float32)
    # jitted init: one compiled (and persistently cached) program instead
    # of eager per-op dispatch — minutes saved through a device tunnel
    variables = jax.jit(
        lambda r, x: model.init(r, x, train=False)
    )(jax.random.PRNGKey(args.seed), sample)
    variables = dict(variables)

    # pretrain-checkpoint loading matrix (segment_network.py:63-162)
    if args.pretrain_type not in (PretrainType.RANDOM, PretrainType.NONE):
        path = args.pretrain_path
        if os.path.isdir(path) and not os.path.exists(os.path.join(path, "meta.json")):
            path = latest_checkpoint(path) or path
        ckpt_state, meta = _load_any_checkpoint(path)
        variables, report = load_pretrained_into_segmentor(
            variables, ckpt_state, meta, args.pretrain_type,
            use_backbone_only=args.use_backbone_only,
        )
        logger.info(
            f"loaded {len(report.get('loaded', []))} tensors from {path}; "
            f"dropped {report.get('dropped', [])}"
        )
        if not report.get("loaded"):
            # fail-loud upgrade over the reference, which load_state_dicts
            # with strict=False and silently trains from random init when
            # no key matches (segment_network.py:92) — e.g. a U-Net-backbone
            # pretrain checkpoint fed to the DeepLabV3 finetune config
            raise ValueError(
                f"{args.pretrain_type.name} checkpoint at {path} contributed "
                "ZERO tensors to the segmentor (incompatible backbone or "
                "layout); refusing to silently train from random init"
            )

    tx = optax.adam(args.learning_rate)
    tx = optax.chain(optax.add_decayed_weights(args.weight_decay), tx)

    frozen_mask = None
    if args.linear_evaluation:
        # freeze the backbone (reference finetune.py:219-222)
        frozen_mask = jax.tree_util.tree_map_with_path(
            lambda path, _: any(
                getattr(p, "key", None) == "backbone" for p in path
            ),
            variables["params"],
        )

    train_step, eval_step, metrics_of = make_seg_steps(
        model, tx, args.num_classes, hw, frozen_mask=frozen_mask
    )
    state = create_seg_state(
        jax.random.PRNGKey(args.seed), model, tx, sample,
        init_params=variables["params"],
        init_batch_stats=variables.get("batch_stats", {}),
    )

    mesh = create_mesh()
    state = shard_pytree(state, mesh)
    aug_cfg = lemon_augment_config() if args.lemon_data else FinetuneAugmentConfig()

    def fused_train_step(state, batch, rng, confusion):
        k_aug, k_drop = jax.random.split(rng)
        images, masks = finetune_augment_batch(
            k_aug, batch["image"], batch["mask"], aug_cfg
        )
        return train_step(state, {"image": images, "mask": masks}, k_drop, confusion)

    def eval_with_norm(state, batch, confusion):
        images = batch["image"].astype(jnp.float32) / 255.0
        b = dict(batch, image=images)
        return eval_step(state, b, confusion)

    def eval_with_flips(state, batch, rng, confusion):
        # the reference's VAL transform is stochastic: polyp flips H+V
        # (finetune_dataset.py:325-336); lemon flips H + GridDistortion
        # (:368-377).  Affects best-ckpt selection comparability.
        images = batch["image"].astype(jnp.float32) / 255.0
        images, masks = eval_augment_batch(
            rng, images, batch["mask"],
            hflip_p=0.5,
            vflip_p=0.0 if args.lemon_data else 0.5,
            distort_p=0.2 if args.lemon_data else 0.0,
        )
        b = dict(batch, image=images, mask=masks)
        return eval_step(state, b, confusion)

    jit_train = jax.jit(fused_train_step, donate_argnums=(0, 3))
    jit_eval = jax.jit(eval_with_norm, donate_argnums=(2,))
    jit_eval_flips = jax.jit(eval_with_flips, donate_argnums=(3,))

    # segmentation-overlay artifacts (reference CustomCallback,
    # finetune.py:86-139: image + gt + prediction grids every n epochs)
    from cp2_tpu.train.segmentation_task import seg_forward

    def predict(state, images):
        images = images.astype(jnp.float32) / 255.0
        _, preds, _ = seg_forward(
            model,
            {"params": state.params, "batch_stats": state.batch_stats},
            images, hw, train=False,
        )
        return preds

    jit_predict = jax.jit(predict)

    overlay_batch_cache = []

    def write_overlays(state, epoch):
        from cp2_tpu.utils.visualize import segmentation_overlay_grid

        # fetch one val batch ONCE and reuse it for every visualization
        # epoch — drawing from a fresh epoch_iterator each time abandoned a
        # live loader (worker pool) mid-epoch and re-decoded a full batch
        if not overlay_batch_cache:
            try:
                it = val_loader.epoch_iterator(0)
                overlay_batch_cache.append(next(it))
                for _ in it:  # drain so the loader finishes cleanly
                    pass
            except StopIteration:
                return
        batch = overlay_batch_cache[0]
        preds = np.asarray(jax.device_get(jit_predict(state, batch["image"])))
        k = min(8, len(preds))
        path = segmentation_overlay_grid(
            np.asarray(batch["image"][:k], np.float32) / 255.0,
            np.asarray(batch["mask"][:k]),
            preds[:k],
            os.path.join(run_dir, "visuals", f"segmentations_epoch_{epoch:04d}.png"),
        )
        sink.log_images({"Segmentations": path}, step=step)

    eval_key = jax.random.fold_in(root_key, 0x5EED)

    def run_eval(loader, prefix, *, flips=False, epoch=0):
        confusion = ConfusionState.create(args.num_classes)
        loss_sum = 0.0
        weight_sum = 0.0
        for i, batch in enumerate(loader.epoch_iterator(0)):
            batch = shard_batch(batch, mesh)
            if flips:
                k = jax.random.fold_in(jax.random.fold_in(eval_key, epoch), i)
                confusion, m = jit_eval_flips(state, batch, k, confusion)
            else:
                confusion, m = jit_eval(state, batch, confusion)
            w = float(m["weight"])
            loss_sum += float(m["loss"]) * w
            weight_sum += w
        result = {k: float(v) for k, v in metrics_of(confusion, prefix).items()}
        if weight_sum > 0:
            result[f"{prefix}loss"] = loss_sum / weight_sum
        return result

    # ---------------- loop ----------------
    step_timer = None
    if args.use_profiler:
        # Lightning profiler="simple" analog (reference finetune.py:232):
        # wall-clock per-step stats, summarized each epoch.  (A full
        # jax.profiler trace over whole epochs serializes hundreds of MB —
        # use tools/profile_step.py for op-level traces.)
        from cp2_tpu.utils.profiling import StepTimer

        step_timer = StepTimer()

    best_iou = -1.0
    best_path = None
    monitor = (
        "val_BinaryJaccardIndex" if args.num_classes == 2
        else "val_MulticlassJaccardIndex"
    )
    step = 0
    with mesh:
        for epoch in range(args.epochs):
            if args.visualize_freq > 0 and epoch % args.visualize_freq == 0:
                write_overlays(state, epoch)
            confusion = ConfusionState.create(args.num_classes)
            t0 = time.time()
            if args.prefetch_depth > 0:
                from cp2_tpu.data.prefetch import DevicePrefetcher

                staged = DevicePrefetcher(
                    train_loader.epoch_iterator(epoch),
                    lambda b: shard_batch(b, mesh),
                    depth=args.prefetch_depth,
                )
            else:
                staged = (shard_batch(b, mesh)
                          for b in train_loader.epoch_iterator(epoch))
            for i, batch in enumerate(staged):
                if step_timer is not None:
                    step_timer.start()
                state, confusion, m = jit_train(
                    state, batch, jax.random.fold_in(root_key, step), confusion
                )
                if step_timer is not None:
                    step_timer.stop(probe=m["loss"])
                step += 1
                if args.fast_dev_run and i >= 1:
                    if hasattr(staged, "close"):
                        staged.close()
                    break
            train_metrics = {
                k: float(v) for k, v in metrics_of(confusion, "train_").items()
            }
            train_metrics["train_loss"] = float(m["loss"])
            train_metrics["epoch_time"] = time.time() - t0

            val_metrics = run_eval(val_loader, "val_", flips=True, epoch=epoch)
            pseudo_metrics = run_eval(pseudo_loader, "pseudotest_") if pseudo else {}
            sink.log({**train_metrics, **val_metrics, **pseudo_metrics, "epoch": epoch},
                     step=step)
            logger.info(
                f"epoch {epoch}: train_loss={train_metrics['train_loss']:.4f} "
                f"{monitor}={val_metrics.get(monitor, float('nan')):.4f}"
            )

            if val_metrics.get(monitor, -1.0) > best_iou:
                best_iou = val_metrics[monitor]
                prev_best = best_path
                # EVERY process calls save_checkpoint (orbax's save is a
                # global barrier; a rank-0-gated call deadlocks the pod —
                # test_multiprocess_finetune.py); only process 0 writes
                # bytes, like the reference's rank-0 save (main.py:528-550)
                best_path = save_checkpoint(
                    run_dir, step, jax.device_get(state),
                    meta={"epoch": epoch, monitor: best_iou,
                          "pretrain_type": args.pretrain_type.name},
                )
                logger.info(f"new best {monitor}={best_iou:.4f} -> {best_path}")
                if prev_best and prev_best != best_path and \
                        jax.process_index() == 0:
                    # save_top_k=1 parity (reference finetune.py:165-171)
                    import shutil

                    shutil.rmtree(prev_best, ignore_errors=True)
            if step_timer is not None:
                logger.info(f"profiler summary: {step_timer.summary()}")
            if args.fast_dev_run:
                break

        # final test on the best checkpoint (reference finetune.py:257-274)
        if best_path is not None:
            if jax.process_count() > 1:
                # fence rank 0's meta.json/link writes (the array data is
                # already globally synced by orbax's save barrier)
                from cp2_tpu.parallel.collectives import barrier

                barrier()
            state, _ = restore_checkpoint(best_path, jax.device_get(state))
            state = shard_pytree(state, mesh)
        test_metrics = run_eval(test_loader, "test_")
        sink.log(test_metrics, step=step)
        logger.info(f"test: {test_metrics}")
    sink.close()
    return test_metrics


def _load_any_checkpoint(path):
    """Load our orbax checkpoints or torch-format baseline state dicts."""
    import numpy as np

    if os.path.isdir(path):
        import orbax.checkpoint as ocp
        import json

        ckptr = ocp.PyTreeCheckpointer()
        state = ckptr.restore(os.path.join(path, "state"))
        meta = {}
        meta_path = os.path.join(path, "meta.json")
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
        return state, meta
    # torch checkpoint (downloaded baselines / reference artifacts)
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    meta = {}
    if isinstance(ckpt, dict):
        meta = {k: v for k, v in ckpt.items()
                if isinstance(v, (str, int, float))}
        for key in ("state_dict", "model"):
            if key in ckpt:
                ckpt = ckpt[key]
                break
    state = {
        k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
        for k, v in ckpt.items()
    }
    return state, meta


if __name__ == "__main__":
    main(get_args())
