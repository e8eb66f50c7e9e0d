"""Finetune train-step benchmark: supervised seg training throughput on TPU.

Measures the full fused finetune step — on-device augmentation
(flips/jitter/noise) + ResNet-50/ASPP forward+backward + logit resize +
CE + Adam + confusion update — at the reference's finetune envelope
(batch 16, 352², `scripts/polyp.sh:60-85`, `finetune.py:56-59`), the
third benched surface next to `bench.py` (pretrain) and
`tools/bench_infer.py` (serving).

Usage: python tools/bench_finetune.py [--hw 352] [--batch 16] [--steps 30]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    import optax

    cache_dir = os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from bench import _peak_bf16_flops
    from cp2_tpu.augment import FinetuneAugmentConfig, finetune_augment_batch
    from cp2_tpu.config import Config
    from cp2_tpu.models import build_segmentor
    from cp2_tpu.ops.metrics import ConfusionState
    from cp2_tpu.train.segmentation_task import create_seg_state, make_seg_steps
    import cp2_tpu

    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, default=352)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--warmup", type=int, default=5)
    ap.add_argument("--num-classes", type=int, default=2)
    args = ap.parse_args()

    cfg = Config.fromfile(
        os.path.join(os.path.dirname(cp2_tpu.__file__), "configs",
                     "config_finetune.py")
    )
    model_cfg = dict(cfg.model)
    model_cfg["dtype"] = jnp.bfloat16
    model_cfg["decode_head"]["num_classes"] = args.num_classes
    model = build_segmentor(model_cfg)

    # reference finetune optimizer: Adam lr 1e-4 + wd 1e-4
    # (finetune.py:56-59, networks/segment_network.py:294-299)
    tx = optax.chain(optax.add_decayed_weights(1e-4), optax.adam(1e-4))

    hw = (args.hw, args.hw)
    sample = jnp.zeros((args.batch, args.hw, args.hw, 3), jnp.float32)
    train_step, _, _ = make_seg_steps(model, tx, args.num_classes, hw)
    state = create_seg_state(jax.random.PRNGKey(0), model, tx, sample)

    aug_cfg = FinetuneAugmentConfig()

    def fused_train_step(state, batch, rng, confusion):
        k_aug, k_drop = jax.random.split(rng)
        images, masks = finetune_augment_batch(
            k_aug, batch["image"], batch["mask"], aug_cfg
        )
        return train_step(
            state, {"image": images, "mask": masks}, k_drop, confusion
        )

    r = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(
            (r.rand(args.batch, args.hw, args.hw, 3) * 255).astype(np.uint8)
        ),
        "mask": jnp.asarray(
            (r.rand(args.batch, args.hw, args.hw) > 0.7).astype(np.int32)
        ),
    }
    confusion = ConfusionState.create(args.num_classes)
    jitted = jax.jit(fused_train_step, donate_argnums=0)
    rng = jax.random.PRNGKey(1)

    lowered = jitted.lower(state, batch, rng, confusion)
    flops = None
    try:
        flops = lowered.compile().cost_analysis()["flops"]
    except Exception:
        pass

    for i in range(args.warmup):
        state, confusion, m = jitted(state, batch, jax.random.fold_in(rng, i),
                                     confusion)
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for i in range(args.steps):
        state, confusion, m = jitted(
            state, batch, jax.random.fold_in(rng, 100 + i), confusion
        )
    jax.block_until_ready(m["loss"])
    dt = (time.perf_counter() - t0) / args.steps
    ips = args.batch / dt

    mfu = None
    peak = _peak_bf16_flops(jax.devices()[0])
    if flops and peak:
        mfu = round(flops / dt / peak, 4)
    print(json.dumps({
        "metric": "finetune_train_images_per_sec_per_chip",
        "value": round(ips, 2),
        "unit": "images/sec/chip",
        "ms_per_step": round(dt * 1e3, 2),
        "batch": args.batch,
        "hw": args.hw,
        "mfu": mfu,
        "model_flops_per_step": flops,
    }))


if __name__ == "__main__":
    main()
