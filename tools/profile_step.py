"""Capture + summarize an XLA op profile of the CP2 pretrain step on TPU.

Runs the same fused step as ``bench.py`` under ``jax.profiler`` and prints
a per-category / per-op time breakdown parsed from the xplane trace via
the tensorboard_plugin_profile converter (no TensorBoard UI needed).

Usage:  python tools/profile_step.py [--steps N] [--out DIR]
Env knobs mirror bench.py: BENCH_BATCH / BENCH_HW / BENCH_METRICS_LEVEL.
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_step():
    import numpy as np
    import jax
    import jax.numpy as jnp

    cache_dir = os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from cp2_tpu.augment import AugmentConfig, pretrain_batch_augment
    from cp2_tpu.config import Config
    from cp2_tpu.ssl import SSLEncoder, SSLHyperParams, create_pretrain_state
    from cp2_tpu.ssl.model import output_stride_of
    from cp2_tpu.ssl.train_step import (
        backbone_output_stride_of,
        make_optimizer,
        make_pretrain_step,
    )
    from cp2_tpu.types import BackboneType, PretrainType
    import cp2_tpu

    batch = int(os.environ.get("BENCH_BATCH", "32"))
    hw = int(os.environ.get("BENCH_HW", "224"))
    base = hw + 32

    # BENCH_VARIANT selects the SSL family (same config law as
    # tools/bench_pretrain_variant.py): dense families use the dilated
    # ASPP-contrast config, MOCO/BYOL/DENSECL the standard-stride one.
    variant = os.environ.get("BENCH_VARIANT", "CP2")
    pt = PretrainType[variant]
    cfg_name = ("config_pretrain.py"
                if variant in ("CP2", "PROPOSED", "PROPOSED_V2")
                else "config_moco.py")
    cfg = Config.fromfile(
        os.path.join(os.path.dirname(cp2_tpu.__file__), "configs", cfg_name)
    )
    model_cfg = dict(cfg.model)
    hp = SSLHyperParams.for_variant(pt)
    model = SSLEncoder(
        model_cfg=model_cfg,
        pretrain_type=pt,
        backbone_type=BackboneType.DEEPLABV3,
        dim=hp.dim,
        dtype=jnp.bfloat16,
    )
    tx = make_optimizer("sgd", 1e-3)
    aug_cfg = AugmentConfig(out_hw=(hw, hw))
    step_fn = make_pretrain_step(
        model, tx, hp,
        output_stride_of(model_cfg),
        backbone_output_stride_of(model_cfg, BackboneType.DEEPLABV3),
        metrics_level=int(os.environ.get("BENCH_METRICS_LEVEL", "0")),
        augment_fn=lambda rng, raw: pretrain_batch_augment(rng, raw, aug_cfg),
    )
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((batch, hw, hw, 3), jnp.float32)
    state = create_pretrain_state(
        rng, model, tx, hp, sample,
        init_fn=lambda m, r, x: m.init(r, x, method="init_all"),
    )
    r = np.random.RandomState(0)
    raw = {
        k: jnp.asarray((r.rand(batch, base, base, 3) * 255).astype(np.uint8))
        for k in ("fg", "bg0", "bg1")
    }
    jitted = jax.jit(step_fn, donate_argnums=0)
    key = jax.random.PRNGKey(42)  # per-step fold_in happens in-step
    carry = [state]

    def run_one(i):
        carry[0], metrics = jitted(carry[0], raw, key)
        return metrics["loss"]

    return run_one


def build_finetune_step():
    """The fused finetune step at the reference envelope (same program as
    ``tools/bench_finetune.py``): on-device aug + ResNet-50/ASPP fwd+bwd +
    logit resize + CE + Adam + confusion update, batch 16 @ 352² bf16."""
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

    from cp2_tpu.augment import FinetuneAugmentConfig, finetune_augment_batch
    from cp2_tpu.config import Config
    from cp2_tpu.models import build_segmentor
    from cp2_tpu.ops.metrics import ConfusionState
    from cp2_tpu.train.segmentation_task import create_seg_state, make_seg_steps
    import cp2_tpu

    batch = int(os.environ.get("BENCH_BATCH", "16"))
    hw = int(os.environ.get("BENCH_HW", "352"))
    num_classes = 2

    cfg = Config.fromfile(
        os.path.join(os.path.dirname(cp2_tpu.__file__), "configs",
                     "config_finetune.py")
    )
    model_cfg = dict(cfg.model)
    model_cfg["dtype"] = jnp.bfloat16
    model_cfg["decode_head"]["num_classes"] = num_classes
    model = build_segmentor(model_cfg)
    tx = optax.chain(optax.add_decayed_weights(1e-4), optax.adam(1e-4))

    sample = jnp.zeros((batch, hw, hw, 3), jnp.float32)
    train_step, _, _ = make_seg_steps(model, tx, num_classes, (hw, hw))
    state = create_seg_state(jax.random.PRNGKey(0), model, tx, sample)
    aug_cfg = FinetuneAugmentConfig()

    def fused_train_step(state, batch_d, rng, confusion):
        k_aug, k_drop = jax.random.split(rng)
        images, masks = finetune_augment_batch(
            k_aug, batch_d["image"], batch_d["mask"], aug_cfg
        )
        return train_step(
            state, {"image": images, "mask": masks}, k_drop, confusion
        )

    r = np.random.RandomState(0)
    batch_d = {
        "image": jnp.asarray(
            (r.rand(batch, hw, hw, 3) * 255).astype(np.uint8)
        ),
        "mask": jnp.asarray(
            (r.rand(batch, hw, hw) > 0.7).astype(np.int32)
        ),
    }
    jitted = jax.jit(fused_train_step, donate_argnums=0)
    rng = jax.random.PRNGKey(1)
    carry = [state, ConfusionState.create(num_classes)]

    def run_one(i):
        carry[0], carry[1], m = jitted(
            carry[0], batch_d, jax.random.fold_in(rng, i), carry[1]
        )
        return m["loss"]

    return run_one


def summarize(log_dir: str, top: int = 40):
    """Parse the xplane file and print self-time by op name/category."""
    try:
        from xprof.convert import raw_to_tool_data as rtd
    except ImportError:  # older installs
        from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    xplanes = glob.glob(
        os.path.join(log_dir, "**", "*.xplane.pb"), recursive=True
    )
    if not xplanes:
        print("no xplane.pb found under", log_dir)
        return
    xp = max(xplanes, key=os.path.getmtime)
    data, _ = rtd.xspace_to_tool_data([xp], "op_profile", {})
    prof = json.loads(data)

    root = prof.get("byProgramExcludeIdle") or prof.get("byCategory") or {}
    total = root.get("metrics", {}).get("rawTime", 0) or 1
    util = root.get("metrics", {}).get("flops", 0.0)
    print(f"== op profile: device-busy {total/1e12:.4f}s, "
          f"FLOPS util {100*util:.1f}% ==")
    for prog in root.get("children", []):
        t = prog.get("metrics", {}).get("rawTime", 0)
        if t / total < 0.001:
            continue
        print(f"PROGRAM {prog['name']}  {100*t/total:.1f}%")
        cats = sorted(
            prog.get("children", []),
            key=lambda c: -(c.get("metrics", {}).get("rawTime", 0)),
        )
        for cat in cats:
            ct = cat.get("metrics", {}).get("rawTime", 0)
            if ct / total < 0.002:
                continue
            cf = cat.get("metrics", {}).get("flops", 0)
            print(f"  {100*ct/total:6.2f}%  util={100*cf:5.1f}%  {cat['name']}")
            subs = sorted(
                cat.get("children", []),
                key=lambda c: -(c.get("metrics", {}).get("rawTime", 0)),
            )[:top]
            for s in subs:
                st = s.get("metrics", {}).get("rawTime", 0)
                if st / total > 0.005:
                    print(f"      {100*st/total:6.2f}%  {s['name']}")


def summarize_hlo(log_dir: str, top: int = 45):
    """Top self-time HLO ops with their source attribution."""
    try:
        from xprof.convert import raw_to_tool_data as rtd
    except ImportError:
        from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    xplanes = glob.glob(
        os.path.join(log_dir, "**", "*.xplane.pb"), recursive=True
    )
    if not xplanes:
        return
    xp = max(xplanes, key=os.path.getmtime)
    data, _ = rtd.xspace_to_tool_data([xp], "hlo_stats", {})
    prof = json.loads(data)
    # gviz table: cols describe fields, rows carry values
    cols = [c["label"] for c in prof["cols"]]
    idx = {label: i for i, label in enumerate(cols)}

    def get(row, label):
        cell = row["c"][idx[label]]
        return cell.get("v") if cell else None

    rows = []
    for r in prof["rows"]:
        rows.append({
            "cat": get(r, "HLO op category"),
            "name": (get(r, "HLO op name") or "")[:46],
            "expr": (get(r, "HLO op text") or "")[:130],
            "fw": (get(r, "Framework op name") or "")[:60],
            "n": get(r, "#Occurrences"),
            "self_us": float(get(r, "Total self time (us)") or 0.0),
            "bound": get(r, "Bound by") or "",
            "bw": get(r, "Measured memory BW (GiB/s)"),
            "src": get(r, "Source Info") or "",
        })
    rows.sort(key=lambda r: -r["self_us"])
    total = sum(r["self_us"] for r in rows) or 1.0
    print("\n== hlo_stats: top self-time ops ==")
    for r in rows[:top]:
        print(f"{100*r['self_us']/total:6.2f}%  {r['self_us']:9.0f}us  "
              f"x{r['n']:<4} {r['cat']:<20.20} {r['name']:<40.40} "
              f"bound={r['bound']:<8.8} bw={r['bw']} {r['src']} {r['fw']}")
        if r["expr"]:
            print(f"          {r['expr']}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--out", default="/tmp/cp2_profile")
    ap.add_argument("--summarize-only", action="store_true")
    ap.add_argument("--task", choices=("pretrain", "finetune"),
                    default="pretrain")
    args = ap.parse_args()

    if not args.summarize_only:
        import jax

        run_one = (
            build_finetune_step() if args.task == "finetune" else build_step()
        )
        # compile + warm up outside the trace
        for i in range(2):
            loss = run_one(i)
        jax.block_until_ready(loss)
        jax.profiler.start_trace(args.out)
        for i in range(2, 2 + args.steps):
            loss = run_one(i)
        jax.block_until_ready(loss)
        jax.profiler.stop_trace()
    summarize(args.out)
    summarize_hlo(args.out)


if __name__ == "__main__":
    main()
