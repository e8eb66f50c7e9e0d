"""CutPaste/"mirror" pretraining entry point (mirror_pretrain.py parity).

Replaces the reference's Lightning driver (mirror_pretrain.py:145-249):
host streams deliver base frames; CutPaste synthesis (patch cut/paste +
mask) runs ON DEVICE fused with the train step; checkpoints select on
``val_loss`` (reference :172-178).  Note the reference forces the decode
head to the classifier branch (``contrast=False``, :210-211) — same here.

Run: ``python -m cp2_tpu.train.mirror_pretrain --run_id r0 --log_dir
/tmp/logs --data_dirs <dir>``
"""

from __future__ import annotations

import argparse
import os
import time

from cp2_tpu.types import MirrorVariant


def get_args(argv=None):
    parser = argparse.ArgumentParser()
    # fmt: off
    parser.add_argument('--config', default=None)
    parser.add_argument('--seed', type=int, default=0)
    parser.add_argument('--run_id', type=str, required=True)
    parser.add_argument('--tags', nargs='+', default=[])
    parser.add_argument('--data_dirs', nargs='+', required=True)
    parser.add_argument('--log_dir', type=str, required=True)
    parser.add_argument('--wandb_project', type=str, default='ssl-pretraining')
    parser.add_argument('--wandb_team', type=str, default=None)
    parser.add_argument('--use_wandb', action='store_true')
    parser.add_argument('--offline_wandb', action='store_true')
    parser.add_argument('--num-workers', type=int, default=4, dest='num_workers')
    parser.add_argument('--native_loader', action='store_true', default=True,
                        help='use the C++ decode pool when available')
    parser.add_argument('--no-native_loader', dest='native_loader',
                        action='store_false')
    parser.add_argument('--raw_cache_dir', type=str, default=None,
                        help='directory for the native raw-frame cache '
                             '(decode+resize once, mmap after)')
    parser.add_argument('--fast_dev_run', action='store_true')
    parser.add_argument('--use_profiler', action='store_true')
    parser.add_argument('--prefetch_depth', default=2, type=int,
                        help='device-resident input batches staged ahead '
                             '(0 disables the background H2D thread)')

    parser.add_argument('-x', '--img_x_size', type=int, default=512)
    parser.add_argument('-y', '--img_y_size', type=int, default=512)
    parser.add_argument('--num_classes', type=int, default=2)
    parser.add_argument('--lemon_data', action='store_true')

    parser.add_argument('--softmax_temp', type=float, default=2)
    parser.add_argument('--lmbd_compare_loss', type=float, default=0.01)
    parser.add_argument('--variant', choices=[x.name for x in MirrorVariant],
                        default=MirrorVariant.OUTPUT.name)
    parser.add_argument('--max_num_patches', type=int, default=1)
    parser.add_argument('--min_area_scale', type=float, default=0.02)
    parser.add_argument('--max_area_scale', type=float, default=0.15)
    parser.add_argument('--min_aspect_ratio', type=float, default=1/3)
    parser.add_argument('--max_aspect_ratio', type=float, default=4/3)
    parser.add_argument('--min_rotation', type=int, default=0)
    parser.add_argument('--max_rotation', type=int, default=0)

    parser.add_argument('--batch-size', type=int, default=10, dest='batch_size')
    parser.add_argument('--lr', type=float, default=0.001)
    parser.add_argument('--epochs', type=int, default=200)
    parser.add_argument('--weight_decay', type=float, default=1e-4)
    parser.add_argument('--bf16', action='store_true', default=True)
    parser.add_argument('--no-bf16', dest='bf16', action='store_false')
    # fmt: on

    args = parser.parse_args(argv)
    args.log_dir = os.path.abspath(os.path.expanduser(args.log_dir))
    args.variant = MirrorVariant[args.variant]
    if args.lemon_data:
        args.img_x_size = 544
        args.img_y_size = 1024
        args.epochs = 200
        args.max_area_scale = 0.007
        args.min_area_scale = 0.0003
        args.max_num_patches = 1
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

    import numpy as np
    import jax
    import jax.numpy as jnp
    import optax

    import cp2_tpu
    from cp2_tpu.augment.cutpaste import CutPasteConfig, cutpaste_batch
    from cp2_tpu.augment import AugmentConfig, two_crop_augment_batch
    from cp2_tpu.augment import functional as F
    from cp2_tpu.checkpoint import save_checkpoint
    from cp2_tpu.config import Config
    from cp2_tpu.data import HostDataLoader, PretrainDataSource
    from cp2_tpu.data.datasets import get_pretrain_files
    from cp2_tpu.models import build_segmentor
    from cp2_tpu.ops.metrics import ConfusionState
    from cp2_tpu.parallel import create_mesh, shard_batch, shard_pytree
    from cp2_tpu.train.mirror_task import make_mirror_steps
    from cp2_tpu.train.segmentation_task import create_seg_state
    from cp2_tpu.types import DatasetType
    from cp2_tpu.utils import MetricLogger, seed_everything, setup_logger

    root_key = seed_everything(args.seed)
    run_dir = os.path.join(args.log_dir, args.run_id)
    os.makedirs(run_dir, exist_ok=True)
    logger = setup_logger("mirror", run_dir)
    sink = MetricLogger(
        args.log_dir, args.run_id, use_wandb=args.use_wandb,
        wandb_project=args.wandb_project, wandb_team=args.wandb_team,
        offline=args.offline_wandb, config={"hyper-parameters": vars(args)},
        tags=["cutpaste"] + args.tags,
    )

    hw = (args.img_x_size, args.img_y_size)
    train_files = get_pretrain_files(args.data_dirs, DatasetType.CSV, "train")
    val_files = get_pretrain_files(args.data_dirs, DatasetType.CSV, "val")
    base_hw = (hw[0] + 32, hw[1] + 32)
    if not train_files:
        raise ValueError("train split is empty — check --data_dirs")
    if args.batch_size > len(train_files):
        # tiny smoke datasets: a drop_last train loader would yield 0 steps
        eff = max(len(train_files), 1)
        logger.warning(
            f"batch_size {args.batch_size} > train files "
            f"{len(train_files)}; clamping to {eff}"
        )
        args.batch_size = eff

    # multi-host input sharding (reference DistributedSampler equivalent)
    shard = (jax.process_index(), jax.process_count())
    if args.batch_size % shard[1]:
        raise ValueError(
            f"batch_size {args.batch_size} not divisible by "
            f"{shard[1]} processes"
        )
    local_batch = args.batch_size // shard[1]

    if getattr(args, "raw_cache_dir", None):
        os.makedirs(args.raw_cache_dir, exist_ok=True)

    def loader(files, shuffle, seed):
        # the mirror path runs the largest frames (512²/544×1024), where
        # host decode cost hurts most — prefer the C++ pool like the
        # pretrain/finetune CLIs
        if getattr(args, "native_loader", True):
            try:
                from cp2_tpu.native import (
                    NativePretrainLoader,
                    default_cache_path,
                    native_available,
                )

                if native_available():
                    cache = default_cache_path(
                        args.raw_cache_dir, files, base_hw, "none"
                    ) if getattr(args, "raw_cache_dir", None) else None
                    return NativePretrainLoader(
                        files, local_batch, base_hw,
                        threads=max(args.num_workers, 1), seed=seed,
                        shuffle=shuffle, drop_last=shuffle, shard=shard,
                        cache_path=cache,
                    )
            except Exception as e:
                logger.info(f"native loader unavailable ({e}); using Python loader")
        return HostDataLoader(
            PretrainDataSource(files, base_hw), local_batch,
            shuffle=shuffle, drop_last=shuffle, seed=seed,
            num_workers=args.num_workers, shard=shard,
        )

    train_loader = loader(train_files, True, args.seed)
    # mirror base images come from an independently shuffled stream
    mirror_loader = loader(train_files, True, args.seed + 7)
    val_loader = loader(val_files, False, args.seed + 1)
    val_mirror_loader = loader(val_files, False, args.seed + 8)

    config_path = args.config or os.path.join(
        os.path.dirname(cp2_tpu.__file__), "configs", "config_finetune.py"
    )
    cfg = Config.fromfile(config_path)
    cfg.model.decode_head.num_classes = args.num_classes
    cfg.model.decode_head["contrast"] = False  # reference :210-211
    cfg.model["dtype"] = jnp.bfloat16 if args.bf16 else jnp.float32
    model = build_segmentor(cfg)

    tx = optax.chain(
        optax.add_decayed_weights(args.weight_decay), optax.adam(args.lr)
    )
    sample = jnp.zeros((args.batch_size, *hw, 3), jnp.float32)
    state = create_seg_state(jax.random.PRNGKey(args.seed), model, tx, sample)

    cut_cfg = CutPasteConfig(
        num_classes=args.num_classes,
        max_num_patches=args.max_num_patches,
        min_area_scale=args.min_area_scale,
        max_area_scale=args.max_area_scale,
        min_aspect_ratio=args.min_aspect_ratio,
        max_aspect_ratio=args.max_aspect_ratio,
        min_rotation=args.min_rotation,
        max_rotation=args.max_rotation,
    )
    aug_cfg = AugmentConfig(out_hw=hw)
    train_step, eval_step = make_mirror_steps(
        model, tx, args.num_classes, hw,
        mirror_variant=args.variant,
        lmbd_compare_loss=args.lmbd_compare_loss,
        softmax_temp=args.softmax_temp,
    )

    def prepare(rng, frames, mirror_frames):
        """Base geometric/photometric transform + CutPaste, fully on device."""
        k1, k2, k3 = jax.random.split(rng, 3)
        n = frames.shape[0]

        def base_view(key, img):
            img = img.astype(jnp.float32) / 255.0
            kc, kp = jax.random.split(key)
            crop = F.sample_resized_crop(kc, img.shape[:2], (0.2, 1.0))
            view = F.crop_resize_bilinear(img, crop, hw)
            return F.color_jitter(kp, view, p=0.75)

        base = jax.vmap(base_view)(jax.random.split(k1, n), frames)
        mirrors = None
        if args.variant == MirrorVariant.OUTPUT:
            mirrors = jax.vmap(base_view)(
                jax.random.split(k2, n), mirror_frames
            )
        return cutpaste_batch(k3, base, mirrors, cut_cfg)

    def fused_train(state, frames, mirror_frames, rng, confusion):
        k_aug, k_step = jax.random.split(rng)
        batch = prepare(k_aug, frames, mirror_frames)
        return train_step(state, batch, k_step, confusion)

    def fused_eval(state, frames, mirror_frames, valid, rng, confusion):
        batch = prepare(rng, frames, mirror_frames)
        batch["valid"] = valid  # pad mask from drop_last=False val loaders
        return eval_step(state, batch, confusion)

    mesh = create_mesh()
    state = shard_pytree(state, mesh)
    jit_train = jax.jit(fused_train, donate_argnums=(0, 4))
    jit_eval = jax.jit(fused_eval, donate_argnums=(5,))

    step_timer = None
    if args.use_profiler:
        # Lightning profiler="simple" analog (reference
        # mirror_pretrain.py:230): wall-clock per-step stats summarized at
        # exit.  (A full jax.profiler trace over a whole run produces
        # hundreds of MB and takes minutes to serialize — use
        # tools/profile_step.py for op-level traces.)
        from cp2_tpu.utils.profiling import StepTimer

        step_timer = StepTimer()

    best_val = float("inf")
    step = 0
    with mesh:
        for epoch in range(args.epochs):
            confusion = ConfusionState.create(args.num_classes)
            metrics = {}
            pairs = zip(
                train_loader.epoch_iterator(epoch),
                mirror_loader.epoch_iterator(epoch),
            )

            def _stage(pair):
                b, m = pair
                return (shard_batch(b["image"], mesh),
                        shard_batch(m["image"], mesh))

            # background H2D staging, same as the pretrain/finetune CLIs
            # (--prefetch_depth): decode, transfer of batch i+1, and step i
            # overlap instead of serializing on the single Python thread
            if args.prefetch_depth > 0:
                from cp2_tpu.data.prefetch import DevicePrefetcher

                staged = DevicePrefetcher(pairs, _stage,
                                          depth=args.prefetch_depth)
            else:
                staged = map(_stage, pairs)
            for i, (frames, mirror_frames) in enumerate(staged):
                if step_timer is not None:
                    step_timer.start()
                state, confusion, metrics = jit_train(
                    state, frames, mirror_frames,
                    jax.random.fold_in(root_key, step), confusion,
                )
                if step_timer is not None:
                    step_timer.stop(probe=metrics["train_loss"])
                step += 1
                if args.fast_dev_run and i >= 1:
                    if hasattr(staged, "close"):
                        staged.close()  # stop the prefetch thread promptly
                    break
            val_losses = []
            vconf = ConfusionState.create(args.num_classes)
            for i, (b, m) in enumerate(zip(
                val_loader.epoch_iterator(0), val_mirror_loader.epoch_iterator(0)
            )):
                sb = shard_batch(
                    {"image": b["image"],
                     "valid": b.get("valid", np.ones(len(b["image"]), bool))},
                    mesh,
                )
                mirror_frames = shard_batch(m["image"], mesh)
                vconf, vm = jit_eval(
                    state, sb["image"], mirror_frames, sb["valid"],
                    jax.random.fold_in(root_key, 10_000_000 + i), vconf,
                )
                val_losses.append(
                    (float(vm["val_loss"]), float(vm["weight"]))
                )
                if args.fast_dev_run and i >= 1:
                    break
            val_loss = (
                sum(l * w for l, w in val_losses)
                / max(sum(w for _, w in val_losses), 1e-9)
                if val_losses else float("nan")
            )
            sink.log(
                {**{k: float(v) for k, v in metrics.items()},
                 "val_loss_epoch": val_loss, "epoch": epoch},
                step=step,
            )
            logger.info(f"epoch {epoch}: val_loss={val_loss:.4f}")
            if val_loss < best_val:
                best_val = val_loss
                # all processes call (orbax save = global barrier); only
                # process 0 writes bytes (val_loss is replicated, so every
                # host takes this branch together)
                path = save_checkpoint(
                    run_dir, step, jax.device_get(state),
                    meta={"epoch": epoch, "val_loss": val_loss,
                          "pretrain_type": "MIRROR"},
                )
                logger.info(f"new best val_loss={val_loss:.4f} -> {path}")
            if args.fast_dev_run:
                break
    if step_timer is not None:
        logger.info(f"profiler summary: {step_timer.summary()}")
    sink.close()
    return state


if __name__ == "__main__":
    main(get_args())
