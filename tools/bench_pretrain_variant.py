"""Pretrain-step throughput for non-CP2 SSL variants on TPU.

`bench.py` is the driver-run headline (CP2); this measures the same fused
step — on-device two-crop augmentation + dual-encoder fwd/bwd + EMA +
queue updates — for the other forward families (DENSECL/PROPOSED_V2
exercise the DenseCL neck, queue2, and similarity matching; MOCO/BYOL the
flattened-projector paths), mirroring the reference's one-loader-for-all
design (`/root/reference/main.py`, `builder.py:651-665` dispatch).

Usage: python tools/bench_pretrain_variant.py --variant DENSECL
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

    cache_dir = os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from bench import _peak_bf16_flops
    from cp2_tpu.augment import AugmentConfig, pretrain_batch_augment
    from cp2_tpu.config import Config
    from cp2_tpu.ssl import SSLEncoder, SSLHyperParams, create_pretrain_state
    from cp2_tpu.ssl.train_step import (
        dense_output_stride_of,
        backbone_output_stride_of,
        make_optimizer,
        make_pretrain_step,
    )
    from cp2_tpu.types import BackboneType, PretrainType
    import cp2_tpu

    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="DENSECL",
                    choices=[t.name for t in PretrainType
                             if t.name in ("CP2", "PROPOSED", "PROPOSED_V2",
                                           "DENSECL", "MOCO", "BYOL")])
    ap.add_argument("--backbone", default="DEEPLABV3",
                    choices=[b.name for b in BackboneType])
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--hw", type=int, default=224)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--warmup", type=int, default=5)
    args = ap.parse_args()

    pt = PretrainType[args.variant]
    bt = BackboneType[args.backbone]
    if bt != BackboneType.DEEPLABV3 and args.variant not in (
        "CP2", "PROPOSED", "PROPOSED_V2"
    ):
        # Reference parity: MoCo/BYOL/DenseCL assume encoder.backbone(...)[3]
        # + a flat/conv projector sized for the segmentor's ResNet; the
        # reference crashes on UNET_* there (builder.py:1015-1016 with :96-101
        # conv projectors), so the ablation backbones are CP2-family-only.
        ap.error(f"--backbone {args.backbone} supports only the CP2/PROPOSED "
                 f"dense family, not {args.variant}")
    base = args.hw + 32

    # reference config selection: CP2/PROPOSED* run the dilated-ResNet ASPP
    # contrast config, MOCO/BYOL/DENSECL the standard-stride FCN-passthrough
    # one (reference scripts/*.sh --config flags; scripts/ablation.sh here)
    cfg_name = ("config_pretrain.py"
                if args.variant in ("CP2", "PROPOSED", "PROPOSED_V2")
                else "config_moco.py")
    cfg = Config.fromfile(
        os.path.join(os.path.dirname(cp2_tpu.__file__), "configs", cfg_name)
    )
    model_cfg = dict(cfg.model)
    hp = SSLHyperParams.for_variant(pt)
    model = SSLEncoder(
        model_cfg=model_cfg, pretrain_type=pt,
        backbone_type=bt, dim=hp.dim,  # 128 dense family / 256 MoCo-BYOL
        dtype=jnp.bfloat16,
    )
    tx = make_optimizer("sgd", 1e-3)
    aug_cfg = AugmentConfig(out_hw=(args.hw, args.hw))
    metrics_level = int(os.environ.get("BENCH_METRICS_LEVEL", "0"))
    step_fn = make_pretrain_step(
        model, tx, hp,
        dense_output_stride_of(model_cfg, bt, hp.unet_truncated_dec_blocks),
        backbone_output_stride_of(model_cfg, bt, hp.unet_truncated_dec_blocks),
        metrics_level=metrics_level,
        augment_fn=lambda rng, raw: pretrain_batch_augment(rng, raw, aug_cfg),
    )
    sample = jnp.zeros((args.batch, args.hw, args.hw, 3), jnp.float32)
    state = create_pretrain_state(
        jax.random.PRNGKey(0), model, tx, hp, sample,
        init_fn=lambda m, r, x: m.init(r, x, method="init_all"),
    )
    r = np.random.RandomState(0)
    raw = {
        k: jnp.asarray((r.rand(args.batch, base, base, 3) * 255)
                       .astype(np.uint8))
        for k in ("fg", "bg0", "bg1")
    }

    jitted = jax.jit(step_fn, donate_argnums=0)
    key = jax.random.PRNGKey(42)

    lowered = jitted.lower(state, raw, key)
    flops = None
    try:
        flops = lowered.compile().cost_analysis()["flops"]
    except Exception:
        pass

    for _ in range(max(args.warmup, 1)):  # >=1: the timing loop below needs a compiled program
        state, metrics = jitted(state, raw, key)
    jax.block_until_ready(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, metrics = jitted(state, raw, key)
    jax.block_until_ready(metrics["loss"])
    dt = (time.perf_counter() - t0) / args.steps

    mfu = None
    peak = _peak_bf16_flops(jax.devices()[0])
    if flops and peak:
        mfu = round(flops / dt / peak, 4)
    print(json.dumps({
        "metric": f"{args.variant.lower()}{'' if bt == BackboneType.DEEPLABV3 else '_' + bt.name.lower()}_pretrain_images_per_sec_per_chip",
        "value": round(args.batch / dt, 2),
        "unit": "images/sec/chip",
        "ms_per_step": round(dt * 1e3, 2),
        "batch": args.batch,
        "hw": args.hw,
        "mfu": mfu,
        "model_flops_per_step": flops,
    }))


if __name__ == "__main__":
    main()
