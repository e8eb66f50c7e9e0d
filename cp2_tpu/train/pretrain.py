"""Pretraining entry point (CLI-compatible with the reference's main.py).

The reference spawns one process per GPU, wires NCCL, and juggles three
CPU dataloaders (main.py:37-165,315-553).  Here one controller process
drives the whole mesh: three raw-frame host streams feed ONE jitted
program that augments on device, runs the dual-encoder step, and updates
optimizer/EMA/queues — per epoch, with cosine LR, checkpointing, and
resume.

Run: ``python -m cp2_tpu.train.pretrain --run_id r0 --log_dir /tmp/logs
--data_dirs <dir> [--pretrain_type CP2] ...``
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

from cp2_tpu.types import (
    BackboneType,
    DatasetType,
    MappingType,
    NegativeType,
    PretrainType,
)

DEFAULT_QUEUE_SIZE = 65536


def get_args(argv=None):
    parser = argparse.ArgumentParser(
        description="TPU-native copy-paste contrastive pretraining"
    )
    # fmt: off
    parser.add_argument('--config', help='path to model configuration file')
    parser.add_argument('--run_id', required=True, type=str)
    parser.add_argument('--tags', nargs='+', default=[])
    parser.add_argument('--offline_wandb', action='store_true')
    parser.add_argument('--use_wandb', action='store_true')
    parser.add_argument('--debug', action='store_true')

    parser.add_argument('--pretrain_from_scratch', action='store_true')
    parser.add_argument('--use_predictor', action='store_true')
    parser.add_argument('--use_avgpool_global', action='store_true')
    parser.add_argument('--use_symmetrical_loss', action='store_true')
    parser.add_argument('--lmbd_coordinate', default=0, type=float)

    parser.add_argument('--log_dir', type=str, required=True)
    parser.add_argument('--wandb_project', type=str, default='ssl-pretraining')
    parser.add_argument('--wandb_team', type=str, default=None)

    parser.add_argument('--data_dirs', metavar='DIR', nargs='+', required=True)
    parser.add_argument('--directory_type', type=str,
                        choices=[x.name for x in DatasetType],
                        default=DatasetType.FILENAME.name)

    parser.add_argument('--backbone_type', type=str,
                        choices=[x.name for x in BackboneType],
                        default=BackboneType.DEEPLABV3.name)
    parser.add_argument('--pretrain_type', type=str,
                        choices=[x.name for x in PretrainType],
                        default=PretrainType.CP2.name)
    parser.add_argument('--mapping_type', type=str,
                        choices=[x.name for x in MappingType],
                        default=MappingType.CP2.name)
    parser.add_argument('--negative_type', type=str,
                        choices=[x.name for x in NegativeType],
                        default=NegativeType.NONE.name)
    parser.add_argument('--negative_scale', type=float, default=2)
    parser.add_argument('--num-workers', default=4, type=int)

    parser.add_argument('--lmbd_cp2_dense_loss', default=0.2, type=float)
    parser.add_argument('--lmbd_region_corr_weight', default=1, type=float)
    parser.add_argument('--lmbd_pixel_corr_weight', default=1, type=float)
    parser.add_argument('--lmbd_not_corr_weight', default=1, type=float)
    parser.add_argument('--pixel_ids_stride', default=1, type=int)
    parser.add_argument('--unet_truncated_dec_blocks', default=2, type=int)
    parser.add_argument('--same_foreground', action='store_true')
    parser.add_argument('--cap_queue', action='store_true')
    parser.add_argument('--include_background', action='store_true')

    parser.add_argument('--dense_logits_temp', default=1, type=float)
    parser.add_argument('--instance_logits_temp', default=0.2, type=float)

    parser.add_argument('--lemon_data', action='store_true')
    parser.add_argument('--img_height', default=224, type=int)
    parser.add_argument('--img_width', default=224, type=int)
    parser.add_argument('--foreground_min', default=0.5, type=float)
    parser.add_argument('--foreground_max', default=0.8, type=float)

    parser.add_argument('--epochs', default=200, type=int)
    parser.add_argument('--max_steps', default=np.inf, type=float)
    parser.add_argument('--start-epoch', default=0, type=int, dest='start_epoch')
    parser.add_argument('-b', '--batch-size', default=256, type=int, dest='batch_size')
    parser.add_argument('--lr', '--learning-rate', default=0.03, type=float, dest='lr')
    parser.add_argument('--remove_lr_scheduler', action='store_true')
    parser.add_argument('--momentum', default=0.9, type=float)
    parser.add_argument('--optim', default='sgd')
    parser.add_argument('--wd', '--weight-decay', default=1e-4, type=float,
                        dest='weight_decay')
    parser.add_argument('-p', '--print-freq', default=10, type=int, dest='print_freq')
    parser.add_argument('--scalar-freq', default=100, type=int, dest='scalar_freq')
    parser.add_argument('--visual-freq', default=1, type=int, dest='visual_freq',
                        help='epochs between visual artifacts (IoU histograms, '
                             'similarity heatmaps, example grids); 0 disables')
    parser.add_argument('--ckpt-freq', default=100, type=int, dest='ckpt_freq')
    parser.add_argument('--keep-ckpts', default=0, type=int, dest='keep_ckpts',
                        help='garbage-collect all but the newest N step '
                             'checkpoints (0 = keep all, as the reference does)')
    parser.add_argument('--async-ckpt', action='store_true', dest='async_ckpt',
                        help='write checkpoints in background threads '
                             '(training continues during serialization)')
    parser.add_argument('--resume', default='', type=str)
    parser.add_argument('--seed', default=0, type=int)
    parser.add_argument('--metrics_level', default=1, type=int,
                        help='0=loss only, 1=reference scalar families')
    parser.add_argument('--steps-per-call', default=1, type=int,
                        dest='steps_per_call',
                        help='chain K quiet steps into one lax.scan dispatch '
                             '(amortizes host per-call overhead; logging '
                             'steps still run singly). max_steps may '
                             'overshoot by up to K-1.')
    parser.add_argument('--prefetch_depth', default=2, type=int,
                        help='device-resident batches staged ahead by a '
                             'background thread (overlaps H2D of batch i+1 '
                             'with step i); 0 falls back to inline puts')
    parser.add_argument('--imagenet_checkpoint', default='', type=str,
                        help='local torchvision resnet50 checkpoint for ImageNet init')
    parser.add_argument('--bf16', action='store_true', default=True)
    parser.add_argument('--no-bf16', dest='bf16', action='store_false')
    parser.add_argument('--native_loader', action='store_true', default=True,
                        help='use the C++ decode worker pool when available')
    parser.add_argument('--no-native_loader', dest='native_loader',
                        action='store_false')
    parser.add_argument('--raw_cache_dir', type=str, default=None,
                        help='directory for the native raw-frame cache: '
                             'decode+resize runs once, later epochs mmap '
                             '(invalidated when source files change)')
    # fmt: on

    args = parser.parse_args(argv)
    args.directory_type = DatasetType[args.directory_type]
    args.pretrain_type = PretrainType[args.pretrain_type]
    args.backbone_type = BackboneType[args.backbone_type]
    args.mapping_type = MappingType[args.mapping_type]
    args.negative_type = NegativeType[args.negative_type]

    if args.lemon_data:
        args.directory_type = DatasetType.CSV
        args.img_height = 512
        args.img_width = 512
    if args.debug:
        # reference --debug (main.py:47,724-729): a single-rank in-process
        # smoke run at batch 8. The single-controller runtime is already
        # in-process; additionally bound the run to a handful of steps so
        # one invocation exercises the full loop — build → train steps →
        # checkpoint — end to end and exits.
        args.batch_size = 8
        args.epochs = min(args.epochs, 1)
        args.max_steps = min(args.max_steps, 3)
        args.scalar_freq = 1
    return args


def hparams_from_args(args, dataset_size: int):
    """CLI flags → validated SSLHyperParams (reference main.py:390-433).

    Factored out of ``main`` so the script-rot guard
    (tests/test_scripts_dryrun.py) exercises the exact wiring the
    training run uses, including the assert web.
    """
    from cp2_tpu.ssl import SSLHyperParams

    return SSLHyperParams.for_variant(
        args.pretrain_type,
        dataset_size=dataset_size,
        cap_queue=args.cap_queue,
        backbone_type=args.backbone_type,
        mapping_type=args.mapping_type,
        negative_type=args.negative_type,
        negative_scale=args.negative_scale,
        include_background=args.include_background,
        lmbd_cp2_dense_loss=args.lmbd_cp2_dense_loss,
        lmbd_pixel_corr_weight=args.lmbd_pixel_corr_weight,
        lmbd_region_corr_weight=args.lmbd_region_corr_weight,
        lmbd_not_corr_weight=args.lmbd_not_corr_weight,
        lmbd_coordinate=args.lmbd_coordinate,
        dense_logits_temp=args.dense_logits_temp,
        instance_logits_temp=args.instance_logits_temp,
        pixel_ids_stride=args.pixel_ids_stride,
        unet_truncated_dec_blocks=args.unet_truncated_dec_blocks,
        use_predictor=args.use_predictor,
        use_avgpool_global=args.use_avgpool_global,
        use_symmetrical_loss=args.use_symmetrical_loss,
    )


def main(args):
    # Multi-host bootstrap FIRST — before anything touches a JAX backend
    # (reference: dist.init_process_group before model build, main.py:172-178).
    from cp2_tpu.parallel.collectives import initialize as distributed_initialize

    distributed_initialize()

    # amortize the fused-step compile across CLI invocations (sweep legs
    # recompile identical programs otherwise; CP2_JAX_CACHE_DIR overrides)
    from cp2_tpu.utils import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()

    import jax
    import jax.numpy as jnp
    import optax

    import cp2_tpu
    from cp2_tpu.augment import AugmentConfig, pretrain_batch_augment
    from cp2_tpu.checkpoint import (
        gc_checkpoints,
        latest_checkpoint,
        restore_checkpoint,
        save_checkpoint,
        wait_for_checkpoints,
    )
    from cp2_tpu.config import Config
    from cp2_tpu.data import HostDataLoader, PretrainDataSource, get_pretrain_files
    from cp2_tpu.parallel import create_mesh, shard_batch, shard_pytree
    from cp2_tpu.ssl import SSLEncoder, create_pretrain_state
    from cp2_tpu.ssl.model import output_stride_of
    from cp2_tpu.ssl.train_step import (
        backbone_output_stride_of,
        cosine_lr_schedule,
        epoch_scalar_names,
        make_optimizer,
        make_pretrain_step,
    )
    from cp2_tpu.utils import AverageMeter, MetricLogger, ProgressMeter, seed_everything, setup_logger

    root_key = seed_everything(args.seed)
    run_dir = os.path.join(args.log_dir, args.run_id)
    os.makedirs(run_dir, exist_ok=True)
    logger = setup_logger("pretrain", run_dir)
    from cp2_tpu.utils.logging import collect_env

    metrics_sink = MetricLogger(
        args.log_dir, args.run_id,
        use_wandb=args.use_wandb, wandb_project=args.wandb_project,
        wandb_team=args.wandb_team, offline=args.offline_wandb,
        # env capture parity with the reference's nvidia-smi dump (main.py:355)
        config={"hyper-parameters": vars(args), "env": collect_env()},
        tags=["pretrain"] + args.tags,
    )

    config_path = args.config or os.path.join(
        os.path.dirname(cp2_tpu.__file__), "configs", "config_pretrain.py"
    )
    cfg = Config.fromfile(config_path)
    model_cfg = dict(cfg.model)

    files = get_pretrain_files(args.data_dirs, args.directory_type, "train")
    logger.info(f"dataset size: {len(files)}")

    hp = hparams_from_args(args, dataset_size=len(files))

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    model = SSLEncoder(
        model_cfg=model_cfg,
        pretrain_type=args.pretrain_type,
        backbone_type=args.backbone_type,
        dim=hp.dim,
        unet_truncated_dec_blocks=hp.unet_truncated_dec_blocks,
        dtype=dtype,
    )

    hw = (args.img_height, args.img_width)
    need_region = hp.mapping_type in (MappingType.REGION_ID, MappingType.PIXEL_REGION_ID)
    base_hw = (args.img_height + 32, args.img_width + 32)
    source = PretrainDataSource(files, base_hw, with_region_maps=need_region)

    # multi-host input sharding (reference DistributedSampler,
    # main.py:260-279): every stream loads only this process's rows of the
    # global batch; shard_batch assembles the global arrays
    shard = (jax.process_index(), jax.process_count())
    if args.batch_size % shard[1]:
        raise ValueError(
            f"batch_size {args.batch_size} not divisible by "
            f"{shard[1]} processes"
        )
    local_batch = args.batch_size // shard[1]

    if getattr(args, "raw_cache_dir", None):
        os.makedirs(args.raw_cache_dir, exist_ok=True)

    def make_loader(seed, with_region=False):
        # prefer the native C++ decode pool when the toolchain is present;
        # else the Python loader.  Region-map pairing (SAM masks,
        # reference loader.py:75-83) uses the native pair mode.
        if args.native_loader:
            try:
                from cp2_tpu.native import (
                    NativePairLoader,
                    NativePretrainLoader,
                    default_cache_path,
                    native_available,
                )

                if native_available():
                    if with_region:
                        from cp2_tpu.data.datasets import region_mask_path

                        pairs = [(f, region_mask_path(f)) for f in files]
                        cache = default_cache_path(
                            args.raw_cache_dir,
                            [p for pr in pairs for p in pr],
                            base_hw, "region",
                        ) if args.raw_cache_dir else None
                        return NativePairLoader(
                            pairs, local_batch, base_hw, mode="region",
                            threads=max(args.num_workers, 1), seed=seed,
                            shard=shard, cache_path=cache,
                        )
                    cache = default_cache_path(
                        args.raw_cache_dir, files, base_hw, "none"
                    ) if args.raw_cache_dir else None
                    return NativePretrainLoader(
                        files, local_batch, base_hw,
                        threads=max(args.num_workers, 1), seed=seed,
                        shard=shard, cache_path=cache,
                    )
            except Exception as e:  # fall back silently but log once
                logger.info(f"native loader unavailable ({e}); using Python loader")
        return HostDataLoader(
            source, local_batch, shuffle=True, drop_last=True, seed=seed,
            num_workers=args.num_workers, shard=shard,
        )

    # NativePairLoader yields {"image", "mask"}; the pretrain step expects
    # {"image", "region_map"} for the foreground stream
    def _rekey_region(it):
        for b in it:
            yield {"image": b["image"], "region_map": b["mask"]}

    # three streams: foreground two-crop + two backgrounds (main.py:281-283)
    loader_fg = make_loader(args.seed, with_region=need_region)
    loader_bg0 = make_loader(args.seed + 1024)
    loader_bg1 = make_loader(args.seed + 2048)
    fg_is_pair = need_region and not isinstance(loader_fg, HostDataLoader)
    steps_per_epoch = len(loader_fg)
    if steps_per_epoch == 0:
        raise ValueError("dataset smaller than one batch")

    lr = (
        args.lr
        if args.remove_lr_scheduler
        else cosine_lr_schedule(args.lr, args.epochs, steps_per_epoch)
    )
    tx = make_optimizer(args.optim, lr, momentum=args.momentum,
                        weight_decay=args.weight_decay)

    aug_cfg = AugmentConfig(
        out_hw=hw,
        erase_scale=(args.foreground_min, args.foreground_max),
        pixel_ids_stride=hp.pixel_ids_stride,
    )

    def augment_fn(rng, raw):
        return pretrain_batch_augment(rng, raw, aug_cfg)

    from cp2_tpu.ssl.train_step import dense_output_stride_of

    os_ = dense_output_stride_of(
        model_cfg, args.backbone_type, hp.unet_truncated_dec_blocks
    )
    bos = backbone_output_stride_of(
        model_cfg, args.backbone_type, hp.unet_truncated_dec_blocks
    )
    # two compiled variants: the quiet step runs most iterations; the
    # metrics step (full reference scalar families — quantiles etc., ~17%
    # slower) runs only on logging steps.  The reference computes metrics
    # every step; logged values are identical.
    # exact reference epoch aggregates cost a measured 2.4% of the step
    # (1083->1058 img/s on one v5e); --metrics_level 0 remains the full
    # perf escape hatch and disables them like everything else
    want_epoch_scalars = args.metrics_level > 0
    step_fn = make_pretrain_step(
        model, tx, hp, os_, bos,
        metrics_level=0, epoch_scalars=want_epoch_scalars,
        augment_fn=augment_fn,
    )
    step_fn_metrics = (
        make_pretrain_step(
            model, tx, hp, os_, bos,
            metrics_level=args.metrics_level,
            epoch_scalars=want_epoch_scalars, augment_fn=augment_fn,
        )
        if args.metrics_level > 0
        else step_fn
    )
    # third variant: first batch of a visual epoch additionally returns the
    # array payloads for the epoch-start artifacts (reference logs example
    # grids / IoU histograms / similarity heatmaps on the first batch of
    # each epoch, builder.py:1441-1549)
    visuals_on = (
        args.visual_freq > 0
        and args.metrics_level > 0
        and args.pretrain_type in (PretrainType.CP2, PretrainType.PROPOSED)
    )
    step_fn_visual = (
        make_pretrain_step(
            model, tx, hp, os_, bos,
            metrics_level=2, epoch_scalars=want_epoch_scalars,
            augment_fn=augment_fn,
        )
        if visuals_on
        else step_fn_metrics
    )

    sample = jnp.zeros((args.batch_size, *hw, 3), jnp.float32)
    state = create_pretrain_state(
        root_key, model, tx, hp, sample,
        init_fn=lambda m, r, x: m.init(r, x, method="init_all"),
    )

    if not args.pretrain_from_scratch and args.imagenet_checkpoint:
        state = _load_imagenet_backbone(state, args.imagenet_checkpoint, logger)

    start_epoch = args.start_epoch
    if args.resume:
        # --resume accepts a single checkpoint dir (contains the orbax
        # "state" item) OR a run dir, where the latest checkpoint — if any
        # exists yet — is used; a fresh run dir starts from scratch
        if os.path.isdir(os.path.join(args.resume, "state")):
            path = args.resume
        else:
            path = latest_checkpoint(args.resume)
        if path:
            state, meta = restore_checkpoint(path, state)
            start_epoch = int(meta.get("epoch", 0))
            logger.info(f"resumed from {path} (epoch {start_epoch})")
        else:
            logger.info(f"no checkpoint found at {args.resume}")

    mesh = create_mesh()
    logger.info(f"mesh: {mesh}")
    state = shard_pytree(state, mesh)
    jitted = jax.jit(step_fn, donate_argnums=0)
    jitted_metrics = jax.jit(step_fn_metrics, donate_argnums=0)
    jitted_visual = (
        jax.jit(step_fn_visual, donate_argnums=0) if visuals_on else jitted_metrics
    )
    scan_k = max(1, args.steps_per_call)
    if scan_k > 1:
        # K steps per dispatch: scan over K stacked batches; per-step
        # randomness still derives from fold_in(key, state.step) in-step
        def scan_step(state, raw_k, key):
            def body(s, one_raw):
                s, m = step_fn(s, one_raw, key)
                ys = (m["loss"], m["_epoch_vec"]) if want_epoch_scalars \
                    else (m["loss"],)
                return s, ys
            state, ys = jax.lax.scan(body, state, raw_k)
            out = {"loss": ys[0][-1]}
            if want_epoch_scalars:
                # chunk SUM of the epoch family: the loop adds it into the
                # epoch accumulator with the chunk length as the count
                out["_epoch_vec"] = ys[1].sum(0)
            return state, out

        jitted_scan = jax.jit(scan_step, donate_argnums=0)

    def write_visuals(metrics, epoch):
        """Epoch-start artifacts (reference builder.py:1441-1549)."""
        from cp2_tpu.utils import visualize as viz

        vis = {
            k.split("/", 1)[1]: np.asarray(jax.device_get(v))
            for k, v in metrics.items()
            if k.startswith("_visual/")
        }
        if not vis:
            return
        out_dir = os.path.join(run_dir, "visuals", f"epoch_{epoch:04d}")
        os.makedirs(out_dir, exist_ok=True)
        paths = []
        if "ious" in vis:
            paths.append(viz.iou_histogram(
                vis["ious"], os.path.join(out_dir, "iou_histogram.png")))
            paths.append(viz.iou_histogram(
                vis["ious_masked"],
                os.path.join(out_dir, "masked_iou_histogram.png"),
                title="Histogram of Masked IoU values"))
        if "logits_dense" in vis:
            s2 = vis["logits_dense"].shape[1]
            g = int(round(s2 ** 0.5))
            k = min(4, vis["logits_dense"].shape[0])
            paths.append(viz.dense_similarity_heatmaps(
                vis["logits_dense"][:k], vis["mask_a"][:k], vis["mask_b"][:k],
                (g, g), os.path.join(out_dir, "similarity_heatmaps.png")))
        if "img_a" in vis:
            paths.append(viz.example_grid(
                {"img_a": vis["img_a"][:8], "img_b": vis["img_b"][:8]},
                os.path.join(out_dir, "train_examples.png")))
        metrics_sink.log_images({"visuals": paths}, step=step)

    step = int(state.step)
    # exact epoch aggregates (reference on_train_epoch_end averages EVERY
    # step, builder.py:1608-1664): each step returns its cheap epoch-family
    # scalars packed into one vector; the loop keeps a device-side running
    # sum — one async add per dispatch, no host syncs until epoch end
    epoch_names = epoch_scalar_names(args.pretrain_type)
    epoch_vec_sum = None
    epoch_vec_count = 0
    with mesh:
        for epoch in range(start_epoch, args.epochs):
            batch_time = AverageMeter("Time", ":6.3f")
            loss_meter = AverageMeter("Loss", ":.4f")
            progress = ProgressMeter(
                steps_per_epoch, [batch_time, loss_meter], logger,
                prefix=f"Epoch: [{epoch}]",
            )
            current_lr = args.lr if args.remove_lr_scheduler else float(lr(step))
            metrics_sink.log(
                {"epoch": epoch, "update-step": step, "learning_rate": current_lr},
                step=step,
            )
            end = time.time()
            fg_iter = loader_fg.epoch_iterator(epoch)
            if fg_is_pair:
                fg_iter = _rekey_region(fg_iter)
            iters = zip(
                fg_iter,
                loader_bg0.epoch_iterator(epoch),
                loader_bg1.epoch_iterator(epoch),
            )
            metrics = None
            chunk: list = []

            def flush_chunk():
                """Dispatch the buffered quiet steps as one scanned call.

                Partial chunks (epoch end, or a logging step due next) run
                through the single-step program instead — a scan of a
                different length would be a whole new XLA compile."""
                nonlocal state, metrics, step
                if not chunk:
                    return
                if len(chunk) == scan_k:
                    raw_k = jax.tree_util.tree_map(
                        lambda *xs: jnp.stack(xs), *chunk
                    )
                    state, metrics = jitted_scan(state, raw_k, root_key)
                    if want_epoch_scalars:
                        # the scanned program returns the chunk SUM already
                        accum_epoch(metrics["_epoch_vec"], len(chunk))
                    step += len(chunk)
                else:
                    for one_raw in chunk:
                        state, metrics = jitted(state, one_raw, root_key)
                        if want_epoch_scalars:
                            accum_epoch(metrics["_epoch_vec"], 1)
                        step += 1
                chunk.clear()

            def accum_epoch(vec, n):
                """Add a (sum-over-n-steps) epoch-family vector; async."""
                nonlocal epoch_vec_sum, epoch_vec_count
                epoch_vec_sum = vec if epoch_vec_sum is None else (
                    epoch_vec_sum + vec
                )
                epoch_vec_count += n

            def _stage(item):
                """Host batch -> device-resident sharded batch (runs on the
                prefetch thread so H2D of batch i+1 overlaps step i)."""
                fg, bg0, bg1 = item
                raw = {"fg": fg["image"], "bg0": bg0["image"],
                       "bg1": bg1["image"]}
                if args.same_foreground:
                    raw["bg1"] = raw["bg0"]
                if need_region:
                    raw["region_maps"] = fg["region_map"]
                return shard_batch(raw, mesh)

            if args.prefetch_depth > 0:
                from cp2_tpu.data.prefetch import DevicePrefetcher

                staged = DevicePrefetcher(iters, _stage,
                                          depth=args.prefetch_depth)
            else:
                staged = map(_stage, iters)
            for i, raw in enumerate(staged):
                if step > args.max_steps:
                    if hasattr(staged, "close"):
                        staged.close()  # stop the prefetch thread promptly
                    break
                log_now = i % args.scalar_freq == 0 and args.metrics_level > 0
                visual_now = (
                    visuals_on and i == 0 and epoch % args.visual_freq == 0
                )
                if scan_k > 1 and not (
                    log_now or visual_now or i % args.print_freq == 0
                ):
                    chunk.append(raw)
                    if len(chunk) == scan_k:
                        flush_chunk()
                    end = time.time()
                    continue
                flush_chunk()  # keep step order before a singly-run step
                run = (
                    jitted_visual if visual_now
                    else jitted_metrics if log_now
                    else jitted
                )
                state, metrics = run(
                    state, raw, root_key  # per-step fold_in happens in-step
                )
                if want_epoch_scalars:
                    accum_epoch(metrics["_epoch_vec"], 1)
                if i % args.print_freq == 0:
                    loss_meter.update(float(metrics["loss"]))
                    batch_time.update(time.time() - end)
                    progress.display(i)
                if visual_now:
                    write_visuals(metrics, epoch)
                if log_now or visual_now:
                    scalars = {
                        k: float(v) for k, v in metrics.items()
                        if not k.startswith(("_visual/", "_epoch"))
                    }
                    metrics_sink.log(scalars, step=step)
                end = time.time()
                step += 1
            flush_chunk()  # partial chunk at epoch end

            if epoch_vec_count:
                # exact epoch means: every step contributed (reference
                # on_train_epoch_end, builder.py:1608-1664)
                sums = np.asarray(jax.device_get(epoch_vec_sum), np.float64)
                metrics_sink.log(
                    {
                        name: float(v / epoch_vec_count)
                        for name, v in zip(epoch_names, sums)
                    },
                    step=step,
                )
                epoch_vec_sum = None
                epoch_vec_count = 0

            is_last = epoch >= args.epochs - 1
            if (
                epoch % args.ckpt_freq == args.ckpt_freq - 1
                or step > args.max_steps
                or is_last
            ):
                # EVERY process calls save_checkpoint (orbax's save is a
                # global barrier; a rank-0-gated call deadlocks the pod);
                # only process 0 writes bytes — reference rank-0 save
                # semantics (main.py:528-550)
                path = save_checkpoint(
                    run_dir, step, jax.device_get(state),
                    meta={
                        "epoch": epoch + 1,
                        "pretrain_type": args.pretrain_type.name,
                        "backbone_type": args.backbone_type.name,
                    },
                    async_save=args.async_ckpt,
                )
                logger.info(f"saved checkpoint {path}")
                if args.keep_ckpts > 0 and jax.process_index() == 0:
                    wait_for_checkpoints()  # never GC around an in-flight save
                    dropped = gc_checkpoints(run_dir, args.keep_ckpts)
                    if dropped:
                        logger.info(f"gc'd checkpoints {dropped}")
            if step > args.max_steps:
                break
    wait_for_checkpoints()
    metrics_sink.close()
    return state


def _load_imagenet_backbone(state, checkpoint_path, logger):
    """Graft a torch-format ResNet-50 ImageNet checkpoint into both encoders."""
    import torch

    from cp2_tpu.checkpoint.convert import graft_params, torchvision_resnet_to_flax

    sd = torch.load(checkpoint_path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    bb_params, bb_stats = torchvision_resnet_to_flax(sd)

    params = dict(state.params)
    enc = dict(params.get("encoder", {}))
    merged, report = graft_params(enc.get("backbone", {}), bb_params)
    logger.info(
        f"imagenet init: {len(report['loaded'])} tensors loaded, "
        f"{len(report['missing_in_source'])} missing"
    )
    enc["backbone"] = merged
    params["encoder"] = enc

    stats_tree = dict(state.batch_stats)
    enc_s = dict(stats_tree.get("encoder", {}))
    merged_s, _ = graft_params(enc_s.get("backbone", {}), bb_stats)
    enc_s["backbone"] = merged_s
    stats_tree["encoder"] = enc_s

    import jax

    return state.replace(
        params=params,
        batch_stats=stats_tree,
        ema_params=jax.tree_util.tree_map(lambda x: x.copy(), params),
        ema_batch_stats=jax.tree_util.tree_map(lambda x: x.copy(), stats_tree),
    )


if __name__ == "__main__":
    main(get_args())
