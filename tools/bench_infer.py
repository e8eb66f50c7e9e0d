"""Serving-path benchmark: segmentation inference throughput on TPU.

Measures the EncoderDecoder inference path (the deployment surface,
reference mmseg_/apis/inference.py + encoder_decoder.py:181-243) in both
modes:

  whole : one forward at the native resolution (finetune/eval default)
  slide : overlapping-window inference (large inputs, reference
          slide_inference semantics)

Reports images/sec at steady state for bf16 on the current device.

Usage: python tools/bench_infer.py [--hw 352] [--batch 8] [--steps 30]
"""

from __future__ import annotations

import argparse
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

    from cp2_tpu.config import Config
    from cp2_tpu.models import build_segmentor
    from cp2_tpu.train.inference import slide_inference, whole_inference
    import cp2_tpu

    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, default=352,
                    help="input resolution (352 = polyp finetune)")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--slide-crop", type=int, default=256)
    ap.add_argument("--slide-stride", type=int, default=170)
    args = ap.parse_args()

    cfg = Config.fromfile(
        os.path.join(os.path.dirname(cp2_tpu.__file__), "configs",
                     "config_finetune.py")
    )
    model_cfg = dict(cfg.model)
    model_cfg["dtype"] = jnp.bfloat16
    # num_classes is assigned by the finetune entry per dataset
    # (train/finetune.py:190); the serving default is binary polyp
    model_cfg["decode_head"]["num_classes"] = (
        model_cfg["decode_head"].get("num_classes") or 2
    )
    model = build_segmentor(model_cfg)
    x = jnp.zeros((args.batch, args.hw, args.hw, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    r = np.random.RandomState(0)
    img = jnp.asarray(r.rand(args.batch, args.hw, args.hw, 3).astype(np.float32))

    def run(label, fn):
        jitted = jax.jit(fn)
        out = jitted(img)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            out = jitted(img)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.steps
        ips = args.batch / dt
        print(f"  {label}: {dt*1e3:7.2f} ms/batch  {ips:8.1f} img/s  "
              f"logits {tuple(out.shape)}")

    print(f"inference bench: batch {args.batch} @ {args.hw}^2 bf16, "
          f"{jax.devices()[0].platform}")
    run("whole", lambda im: whole_inference(model, variables, im))
    num_classes = dict(cfg.model)["decode_head"]["num_classes"]
    run(
        f"slide {args.slide_crop}/{args.slide_stride}",
        lambda im: slide_inference(
            model, variables, im,
            crop_size=(args.slide_crop, args.slide_crop),
            stride=(args.slide_stride, args.slide_stride),
            num_classes=num_classes,
        ),
    )


if __name__ == "__main__":
    main()
