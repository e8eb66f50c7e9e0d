"""mmseg-style iteration-based training CLI.

Parity with the reference's legacy path (``tools/train.py`` →
``train_segmentor``, ``mmseg_/apis/train.py:34-120``): a full python
config describes model + data + schedule; training is iteration-based
with periodic mIoU evaluation and checkpointing — the workflow used for
VOC-style benchmark runs.

Config surface (python file):
  model        — segmentor dict (same registry names)
  data         — dict(train=..., val=...) each with img_dir, ann_dir,
                 img_size, batch_size
  optimizer    — dict(type='SGD'|'Adam', lr=..., momentum=..., weight_decay=...)
  lr_config    — dict(policy='poly', power=0.9, min_lr=1e-4)
  runner       — dict(max_iters=...)
  checkpoint_config / evaluation — dict(interval=...)

Run: ``python tools/train.py CONFIG --work-dir /tmp/work``
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def get_args(argv=None):
    parser = argparse.ArgumentParser(description="Train a segmentor (iter-based)")
    parser.add_argument("config", help="train config file path")
    parser.add_argument("--work-dir", default=None)
    parser.add_argument("--load-from", default=None)
    parser.add_argument("--resume-from", default=None)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--no-validate", action="store_true")
    return parser.parse_args(argv)


def poly_lr(base_lr: float, max_iters: int, power: float = 0.9, min_lr: float = 1e-4):
    def schedule(step):
        import jax.numpy as jnp

        frac = jnp.clip(step / max_iters, 0.0, 1.0)
        return jnp.maximum(base_lr * (1.0 - frac) ** power, min_lr)

    return schedule


def main(args):
    # Multi-host bootstrap first, before any JAX backend touch.
    from cp2_tpu.parallel.collectives import initialize as distributed_initialize

    distributed_initialize()

    import numpy as np
    import jax
    import jax.numpy as jnp
    import optax

    from cp2_tpu.checkpoint import restore_checkpoint, save_checkpoint
    from cp2_tpu.config import Config
    from cp2_tpu.data import HostDataLoader, SegmentationDataSource
    from cp2_tpu.data.datasets import list_image_mask_pairs
    from cp2_tpu.models import build_segmentor
    from cp2_tpu.ops.metrics import eval_metrics, intersect_and_union
    from cp2_tpu.parallel import create_mesh, shard_batch, shard_pytree
    from cp2_tpu.train.segmentation_task import create_seg_state, make_seg_steps
    from cp2_tpu.ops.metrics import ConfusionState
    from cp2_tpu.utils import seed_everything, setup_logger

    cfg = Config.fromfile(args.config)
    work_dir = args.work_dir or os.path.join(
        "./work_dirs", os.path.splitext(os.path.basename(args.config))[0]
    )
    os.makedirs(work_dir, exist_ok=True)
    logger = setup_logger("train", work_dir)
    root_key = seed_everything(args.seed)

    data_cfg = cfg.data
    num_classes = cfg.model["decode_head"].get("num_classes") or 2
    img_size = data_cfg["train"].get("img_size", 512)
    batch_size = data_cfg["train"].get("batch_size", 8)

    train_pairs = list_image_mask_pairs(
        data_cfg["train"]["img_dir"], data_cfg["train"]["ann_dir"]
    )
    val_pairs = list_image_mask_pairs(
        data_cfg["val"]["img_dir"], data_cfg["val"]["ann_dir"]
    )
    # multi-host input sharding (mmseg DistributedSampler equivalent)
    shard = (jax.process_index(), jax.process_count())
    if batch_size % shard[1]:
        raise ValueError(
            f"samples_per_gpu {batch_size} not divisible by "
            f"{shard[1]} processes"
        )
    local_batch = batch_size // shard[1]
    train_loader = HostDataLoader(
        SegmentationDataSource(train_pairs, img_size, num_classes, random_crop=True),
        local_batch, shuffle=True, seed=args.seed, shard=shard,
    )
    val_loader = HostDataLoader(
        SegmentationDataSource(val_pairs, img_size, num_classes, random_crop=False),
        local_batch, shuffle=False, drop_last=False, shard=shard,
    )

    model = build_segmentor(cfg)
    opt_cfg = cfg.get("optimizer", {"type": "SGD", "lr": 0.01, "momentum": 0.9})
    lr_cfg = cfg.get("lr_config", {"policy": "poly", "power": 0.9, "min_lr": 1e-4})
    max_iters = cfg.get("runner", {}).get("max_iters", 40000)
    lr = poly_lr(opt_cfg["lr"], max_iters, lr_cfg.get("power", 0.9),
                 lr_cfg.get("min_lr", 1e-4))
    if opt_cfg["type"].upper() == "SGD":
        tx = optax.chain(
            optax.add_decayed_weights(opt_cfg.get("weight_decay", 0.0)),
            optax.sgd(lr, momentum=opt_cfg.get("momentum", 0.9)),
        )
    else:
        tx = optax.adam(lr)

    sample = jnp.zeros((batch_size, img_size, img_size, 3), jnp.float32)
    state = create_seg_state(root_key, model, tx, sample)
    start_iter = 0
    if args.resume_from:
        # mmseg resume semantics: weights + optimizer + iteration counter
        # (runner.resume, vs load_from = weights only)
        state, meta = restore_checkpoint(args.resume_from, state)
        start_iter = int(meta.get("iter", int(state.step)))
    elif args.load_from:
        state, _ = restore_checkpoint(args.load_from, state)
    # decode_head.loss_decode + sampler config (Dice/Lovász/OHEM) — the
    # mmseg losses path (decode_head.py:222-242); default CE stays None
    from cp2_tpu.train.segmentation_task import build_decode_loss

    decode_loss = build_decode_loss(dict(cfg.model.get("decode_head", {})))
    train_step, eval_step, _ = make_seg_steps(
        model, tx, num_classes, (img_size, img_size), loss_fn=decode_loss
    )

    def norm_train(state, batch, rng, confusion):
        images = batch["image"].astype(jnp.float32) / 255.0
        return train_step(state, {"image": images, "mask": batch["mask"]},
                          rng, confusion)

    mesh = create_mesh()
    state = shard_pytree(state, mesh)
    jit_train = jax.jit(norm_train, donate_argnums=(0, 3))
    ckpt_interval = cfg.get("checkpoint_config", {}).get("interval", 4000)
    eval_interval = cfg.get("evaluation", {}).get("interval", 4000)

    def validate():
        totals = [jnp.zeros((num_classes,), jnp.float32) for _ in range(4)]
        for batch in val_loader.epoch_iterator(0):
            # drop pad rows of the final short batch (loader repeats the
            # last sample to keep shapes static; counting them biases mIoU)
            v = int(np.sum(batch["valid"])) if "valid" in batch else (
                batch["image"].shape[0]
            )
            batch = {
                "image": batch["image"][:v],
                "mask": batch["mask"][:v],
            }
            images = jnp.asarray(batch["image"], jnp.float32) / 255.0
            logits = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                images, train=False,
            )
            from cp2_tpu.ops.resize import resize_bilinear

            logits = resize_bilinear(logits.astype(jnp.float32),
                                     (img_size, img_size))
            preds = jnp.argmax(logits, axis=-1)
            parts = intersect_and_union(
                preds, jnp.asarray(batch["mask"]), num_classes
            )
            totals = [t + p for t, p in zip(totals, parts)]
        out = eval_metrics(*totals, metrics=("mIoU",))
        return {k: np.asarray(v).tolist() for k, v in out.items()}

    it = start_iter
    epoch = 0
    confusion = ConfusionState.create(num_classes)
    with mesh:
        while it < max_iters:
            for batch in train_loader.epoch_iterator(epoch):
                batch = shard_batch(batch, mesh)
                state, confusion, m = jit_train(
                    state, batch, jax.random.fold_in(root_key, it), confusion
                )
                it += 1
                if it % 50 == 0:
                    logger.info(f"iter {it}/{max_iters} loss={float(m['loss']):.4f}")
                if not args.no_validate and it % eval_interval == 0:
                    logger.info(f"eval@{it}: {validate()}")
                if it % ckpt_interval == 0 or it >= max_iters:
                    # all processes call (orbax save = global barrier);
                    # only process 0 writes bytes
                    save_checkpoint(work_dir, it, jax.device_get(state),
                                    meta={"iter": it})
                if it >= max_iters:
                    break
            epoch += 1
    logger.info(f"final eval: {validate()}")


if __name__ == "__main__":
    main(get_args())
