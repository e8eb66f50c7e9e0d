"""Ground the vs_baseline denominator: measure the REFERENCE CP2 step.

The reference publishes no throughput numbers, so bench.py's
``vs_baseline`` divides by an ASSUMED A100 rate (330 img/s/chip,
BASELINE.md).  VERDICT r3 #3 asks for that assumption to be grounded in
measurement.  This tool runs a same-silicon head-to-head on the host CPU:

* the reference's own ``builder.MODEL.forward_cp2`` + SGD (eager torch,
  fp32) around the REAL architecture — torchvision ResNet-50 with
  ``replace_stride_with_dilation=[False,False,True]`` (identical stage
  semantics/FLOPs to the mmseg dilated OS16 config the reference trains,
  configs/config_pretrain.py) + the 512-channel ASPP contrast head;
* the rebuild's jitted CP2 step (fp32, no on-device aug so the covered
  math matches) on the same CPU.

Both consume identical 224-square inputs at the same batch size.  Output:
per-image step time, the framework ratio on equal silicon, and each
side's achieved model-FLOP/s — the measured eager-torch efficiency that
BASELINE.md's A100-denominator interval is anchored to.

Run: ``PYTHONPATH=/root/repo python tools/reference_denominator.py
--batch 4 --steps 3``  (several minutes on a 1-core host)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def _torch_full_segmentor_factory(seed: int, dim: int):
    """The reference's FULL pretrain architecture in the torch twin:
    dilated Bottleneck ResNet-50 (strides (1,2,2,1), dilations (1,1,1,2),
    contract_dilation — configs/config_pretrain.py) + 512-channel ASPP
    contrast head (mmseg aspp_head.py:53-117 semantics)."""
    from tests._real_model_harness import make_real_segmentor_factory

    return make_real_segmentor_factory(
        seed,
        stage_blocks=(3, 4, 6, 3), block="bottleneck",
        stem_channels=64, base_channels=64,
        strides=(1, 2, 2, 1), dilations=(1, 1, 1, 2),
        contract_dilation=True,
        in_channels=2048, channels=512,
        aspp_dilations=(1, 6, 12, 18), contrast_dim=dim,
    )


def measure_reference(batch, hw, steps, warmup=1):
    import torch

    torch.set_num_threads(os.cpu_count() or 1)
    from tests._reference_harness import (
        build_reference_model,
        import_reference_builder,
    )

    builder = import_reference_builder()
    K, DIM = 4096, 128
    r = np.random.RandomState(5)
    q = r.randn(K, DIM).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    model = build_reference_model(
        builder, dim=DIM, stride=16, seed=3, queue_np=q,
        segmentor_factory=_torch_full_segmentor_factory(3, DIM),
        pretrain_type=builder.PretrainType.CP2,
        mapping_type=builder.MappingType.CP2,
    )
    opt = torch.optim.SGD(
        [p for p in model.parameters() if p.requires_grad],
        lr=1e-3, momentum=0.9, weight_decay=1e-4,
    )

    def batch_tensors(seed):
        rr = np.random.RandomState(seed)
        t = {}
        for k in ("img_a", "img_b"):
            t[k] = torch.from_numpy(
                rr.rand(batch, 3, hw, hw).astype(np.float32))
        for k in ("bg0", "bg1"):
            bg = rr.rand(batch, 3, hw, hw).astype(np.float32)
            bg[:, :, 40:180, 60:200] = 0.0
            t[k] = torch.from_numpy(bg)
        ids = np.arange(1, hw * hw + 1, dtype=np.int64).reshape(1, hw, hw)
        ids = np.repeat(ids, batch, 0)
        for k in ("pixel_ids_a", "pixel_ids_b", "region_ids_a",
                  "region_ids_b"):
            t[k] = torch.from_numpy(ids.copy())
        return t

    def one_step(i):
        t = batch_tensors(100 + i)
        loss = model(
            img_a=t["img_a"], img_b=t["img_b"], bg0=t["bg0"], bg1=t["bg1"],
            visualize=False, step=i, new_epoch=False,
            pixel_ids_a=t["pixel_ids_a"], pixel_ids_b=t["pixel_ids_b"],
            region_ids_a=t["region_ids_a"], region_ids_b=t["region_ids_b"],
        )
        opt.zero_grad()
        loss.backward()
        opt.step()
        return float(loss.detach())

    for i in range(warmup):
        one_step(i)
    t0 = time.perf_counter()
    for i in range(steps):
        one_step(warmup + i)
    dt = time.perf_counter() - t0
    return dt / steps


def measure_ours(batch, hw, steps, warmup=2):
    import jax.numpy as jnp

    import cp2_tpu
    from cp2_tpu.config import Config
    from cp2_tpu.ssl import SSLEncoder, SSLHyperParams, create_pretrain_state
    from cp2_tpu.ssl.model import output_stride_of
    from cp2_tpu.ssl.train_step import (
        backbone_output_stride_of,
        make_optimizer,
        make_pretrain_step,
    )
    from cp2_tpu.types import BackboneType, PretrainType

    cfg = Config.fromfile(os.path.join(
        os.path.dirname(cp2_tpu.__file__), "configs", "config_pretrain.py"))
    model_cfg = dict(cfg.model)
    hp = SSLHyperParams.for_variant(PretrainType.CP2, queue_len=4096)
    model = SSLEncoder(model_cfg=model_cfg, pretrain_type=PretrainType.CP2,
                       dim=128, dtype=jnp.float32)
    tx = make_optimizer("sgd", 1e-3)

    def make_batch(seed):
        rr = np.random.RandomState(seed)
        out = {k: jnp.asarray(rr.rand(batch, hw, hw, 3), jnp.float32)
               for k in ("img_a", "img_b")}
        for k in ("bg0", "bg1"):
            bg = rr.rand(batch, hw, hw, 3).astype(np.float32)
            bg[:, 40:180, 60:200, :] = 0.0
            out[k] = jnp.asarray(bg)
        ids = np.arange(1, hw * hw + 1, dtype=np.int32).reshape(1, hw, hw)
        ids = np.repeat(ids, batch, 0)
        for k in ("pixel_ids_a", "pixel_ids_b", "region_ids_a",
                  "region_ids_b"):
            out[k] = jnp.asarray(ids)
        return out

    sample = jnp.zeros((batch, hw, hw, 3), jnp.float32)
    state = create_pretrain_state(
        jax.random.PRNGKey(0), model, tx, hp, sample,
        init_fn=lambda m, rr, x: m.init(rr, x, method="init_all"),
    )
    step = jax.jit(
        make_pretrain_step(
            model, tx, hp, output_stride_of(model_cfg),
            backbone_output_stride_of(model_cfg, BackboneType.DEEPLABV3),
            metrics_level=0,
        ),
        donate_argnums=0,
    )
    lowered = step.lower(state, make_batch(0), jax.random.PRNGKey(1))
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0] if cost else {}
    flops = float(cost.get("flops", 0.0)) or None

    for i in range(warmup):
        state, m = compiled(state, make_batch(i), jax.random.PRNGKey(1))
    jax.block_until_ready(m["loss"])
    batches = [make_batch(100 + i) for i in range(steps)]
    t0 = time.perf_counter()
    for b in batches:
        state, m = compiled(state, b, jax.random.PRNGKey(1))
    jax.block_until_ready(m["loss"])
    dt = time.perf_counter() - t0
    return dt / steps, flops


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--hw", type=int, default=224)
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--out", default=os.path.join(REPO, "reports", "quality"))
    args = p.parse_args(argv)

    print("measuring rebuild (jax, cpu) ...")
    ours_s, flops = measure_ours(args.batch, args.hw, args.steps)
    print(f"  {ours_s:.2f} s/step")
    print("measuring reference (torch eager, cpu) ...")
    ref_s = measure_reference(args.batch, args.hw, args.steps)
    print(f"  {ref_s:.2f} s/step")

    out = {
        "batch": args.batch,
        "hw": args.hw,
        "steps": args.steps,
        "cpu_count": os.cpu_count(),
        "reference_sec_per_step": ref_s,
        "rebuild_sec_per_step": ours_s,
        "reference_img_per_sec": args.batch / ref_s,
        "rebuild_img_per_sec": args.batch / ours_s,
        "same_silicon_speedup": ref_s / ours_s,
        "model_flops_per_step": flops,
        "reference_model_flops_per_sec": (
            flops / ref_s if flops else None),
        "rebuild_model_flops_per_sec": (
            flops / ours_s if flops else None),
    }
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "denominator_cpu.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))
    return out


if __name__ == "__main__":
    main()
