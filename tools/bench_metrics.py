"""Attribute the cost of the level-1 scalar-metric block on TPU.

The reference logs its full scalar families every step
(``/root/reference/builder.py:988-997,1565-1604``); the rebuild defaults to
``--scalar-freq 100`` because the metric block measured ~21.5% of the step
in round 2.  This tool breaks that cost down — full step at metrics_level
0 vs 1, plus the individual stat kernels — so the expensive piece can be
attacked directly instead of rationed.

Usage: python tools/bench_metrics.py [--full-step]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time(fn, *args, steps=30, warmup=5):
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / steps


def _kernel_times(args, results):
    import jax
    import jax.numpy as jnp

    n, s2, k = args.batch, args.s * args.s, args.k
    key = jax.random.PRNGKey(0)
    logits = jax.random.normal(key, (n, s2, s2), jnp.float32)
    labels = (jax.random.uniform(jax.random.fold_in(key, 1), (n, s2, s2)) < 0.1
              ).astype(jnp.float32)
    l_neg = jax.random.normal(jax.random.fold_in(key, 2), (n, k), jnp.float32)
    l_pos = jax.random.normal(jax.random.fold_in(key, 3), (n, 1), jnp.float32)
    ids_a = jax.random.randint(jax.random.fold_in(key, 4),
                               (n, args.s, args.s), 0, 4096).astype(jnp.float32)
    ids_b = jax.random.randint(jax.random.fold_in(key, 5),
                               (n, args.s, args.s), 0, 4096).astype(jnp.float32)
    mask = jnp.ones((n, args.s, args.s), jnp.float32)

    from cp2_tpu.ops.correlation import dense_loss_stats, get_masked_correlation_map
    from cp2_tpu.ssl.objectives import _instance_stat_metrics

    results["dense_loss_stats"] = _time(
        jax.jit(dense_loss_stats), logits, labels, steps=args.steps)
    results["instance_stats"] = _time(
        jax.jit(_instance_stat_metrics), l_pos, l_neg, steps=args.steps)
    results["masked_corr_map"] = _time(
        jax.jit(get_masked_correlation_map), ids_a, ids_b, mask, mask,
        steps=args.steps)


def _full_step_times(args, results):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cp2_tpu.augment import AugmentConfig, pretrain_batch_augment
    from cp2_tpu.config import Config
    from cp2_tpu.ssl import SSLEncoder, SSLHyperParams, create_pretrain_state
    from cp2_tpu.ssl.model import output_stride_of
    from cp2_tpu.ssl.train_step import (
        backbone_output_stride_of, make_optimizer, make_pretrain_step,
    )
    from cp2_tpu.types import BackboneType, PretrainType
    import cp2_tpu

    hw = 224
    base = hw + 32
    cfg = Config.fromfile(os.path.join(
        os.path.dirname(cp2_tpu.__file__), "configs", "config_pretrain.py"))
    model_cfg = dict(cfg.model)
    hp = SSLHyperParams.for_variant(PretrainType.CP2)
    model = SSLEncoder(
        model_cfg=model_cfg, pretrain_type=PretrainType.CP2,
        backbone_type=BackboneType.DEEPLABV3, dim=128, dtype=jnp.bfloat16,
    )
    tx = make_optimizer("sgd", 1e-3)
    aug_cfg = AugmentConfig(out_hw=(hw, hw))
    sample = jnp.zeros((args.batch, hw, hw, 3), jnp.float32)
    r = np.random.RandomState(0)
    raw = {
        kk: jnp.asarray((r.rand(args.batch, base, base, 3) * 255)
                        .astype(np.uint8))
        for kk in ("fg", "bg0", "bg1")
    }
    rkey = jax.random.PRNGKey(42)
    for lvl in (0, 1):
        step_fn = make_pretrain_step(
            model, tx, hp,
            output_stride_of(model_cfg),
            backbone_output_stride_of(model_cfg, BackboneType.DEEPLABV3),
            metrics_level=lvl,
            augment_fn=lambda rng, rw: pretrain_batch_augment(rng, rw, aug_cfg),
        )
        st = create_pretrain_state(
            jax.random.PRNGKey(0), model, tx, hp, sample,
            init_fn=lambda m, rr, x: m.init(rr, x, method="init_all"),
        )
        jitted = jax.jit(step_fn, donate_argnums=0)
        for _ in range(5):
            st, _m = jitted(st, raw, rkey)
        jax.block_until_ready(_m["loss"])
        t0 = time.perf_counter()
        for _ in range(args.steps):
            st, _m = jitted(st, raw, rkey)
        jax.block_until_ready(_m["loss"])
        results[f"full_step_level{lvl}"] = (time.perf_counter() - t0) / args.steps


def main():
    import jax

    cache_dir = os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--s", type=int, default=14, help="feature grid side")
    ap.add_argument("--k", type=int, default=65536, help="queue length")
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--full-step", action="store_true",
                    help="also time the full CP2 train step at level 0/1")
    args = ap.parse_args()

    results = {}
    _kernel_times(args, results)
    if args.full_step:
        _full_step_times(args, results)

    for name, sec in results.items():
        print(f"{name:24s} {sec * 1e3:9.3f} ms")
    if "full_step_level0" in results:
        d = results["full_step_level1"] - results["full_step_level0"]
        print(f"{'metric overhead':24s} {d * 1e3:9.3f} ms "
              f"({100 * d / results['full_step_level1']:.1f}% of level-1 step)")


if __name__ == "__main__":
    main()
