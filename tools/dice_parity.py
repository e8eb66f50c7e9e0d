"""Head-to-head finetune-Dice parity: reference-pretrained vs ours.

VERDICT r3 recorded "direct reference-Dice comparison is not executable
in this environment" because the reference's CUDA/Lightning stack cannot
run here.  This tool executes the closest direct measurement of the
north star ("finetune Dice on polyp within 0.5 pts of reference"):

1. Build identical CP2 pretrain batches from the synthetic corpus
   (two overlapping crops + exact pixel/region ids + erased backgrounds,
   precomputed in numpy so both frameworks consume the same arrays).
2. Pretrain checkpoints of the same real dilated ResNet + ASPP-contrast
   architecture from the same init (``--arch tiny18`` = the fast
   BasicBlock twin; ``--arch r50`` = the FLAGSHIP dilated Bottleneck-50
   + ASPP-512/contrast-128 the reference trains,
   configs/config_pretrain.py:8-32):
   * ``ref``  — the reference's own ``builder.MODEL.forward_cp2`` + SGD
     on CPU torch (tests/_real_model_harness torch twin, driven by
     /root/reference/builder.py:1124-1606 itself);
   * ``pert``, ``pert1``, … — ``--n_pert`` replicates of the reference
     run, each with a single 1e-6 perturbation on a DIFFERENT kernel
     (the chaos control: how much Dice spread the reference's OWN float
     sensitivity produces — n>=3 makes the envelope a spread, not a
     single draw);
   * ``ours`` — the rebuild's jitted pretrain step (CPU JAX by default;
     ``--ours_device default`` runs it on the TPU backend).
3. Finetune every checkpoint PLUS a from-scratch control through
   the real ``cp2_tpu.train.finetune`` CLI (identical config/data/seed;
   TPU by default, subprocess per leg) and compare test Dice.

Pass criterion: |Dice(ours) − Dice(ref)| ≤ max(max_i |Dice(pert_i) −
Dice(ref)|, 0.005) — the rebuild's checkpoint is indistinguishable from
the reference's up to the reference's own float-noise spread, which is
the strongest executable form of "switching frameworks preserves
finetune Dice".  Writes ``reports/quality/dice_parity[_r50].json``.

Run (stages 1-3 CPU ~20-40 min, finetunes on the TPU ~30 min):
``PYTHONPATH=/root/repo python tools/dice_parity.py``
Smoke: ``python tools/dice_parity.py --smoke --device cpu``
Flagship: ``python tools/dice_parity.py --arch r50 --hw 224 --batch 8
--corpus_size 256 --img_size 352 --n_pert 3 --ours_device default
--log_dir /tmp/dice_parity_r50 --root /tmp/syn_corpus_256``
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

# ---------------------------------------------------------------------------
# architectures: the tiny twin (fast, the r3/r4 instrument) and the FLAGSHIP
# dilated Bottleneck ResNet-50 + ASPP-512/contrast-128 the reference actually
# trains (configs/config_pretrain.py:8-32; VERDICT r4 missing #1)
# ---------------------------------------------------------------------------

ARCHS = {
    "tiny18": dict(
        dim=16, queue_len=64,
        torch_kw=dict(
            stage_blocks=(2, 2, 2, 2), stem_channels=8, base_channels=8,
            strides=(1, 2, 2, 1), dilations=(1, 1, 1, 2),
            contract_dilation=True,
            in_channels=64, channels=16, aspp_dilations=(1, 6, 12, 18),
            contrast_dim=16,
        ),
        flax_backbone=dict(
            type="ResNet", depth=18, stem_channels=8, base_channels=8,
            strides=(1, 2, 2, 1), dilations=(1, 1, 1, 2),
            contract_dilation=True, out_indices=(0, 1, 2, 3),
            norm_cfg={"type": "BN"},
        ),
        head_in_channels=64, head_channels=16,
    ),
    "r50": dict(
        dim=128, queue_len=512,
        torch_kw=dict(
            stage_blocks=(3, 4, 6, 3), block="bottleneck",
            stem_channels=64, base_channels=64,
            strides=(1, 2, 2, 1), dilations=(1, 1, 1, 2),
            contract_dilation=True,
            in_channels=2048, channels=512, aspp_dilations=(1, 6, 12, 18),
            contrast_dim=128,
        ),
        flax_backbone=dict(
            type="ResNet", depth=50, stem_channels=64, base_channels=64,
            strides=(1, 2, 2, 1), dilations=(1, 1, 1, 2),
            contract_dilation=True, out_indices=(0, 1, 2, 3),
            norm_cfg={"type": "BN"},
        ),
        head_in_channels=2048, head_channels=512,
    ),
}


def flax_pretrain_cfg(arch: dict) -> dict:
    return {
        "backbone": dict(arch["flax_backbone"]),
        "decode_head": dict(
            type="ASPPHead", in_channels=arch["head_in_channels"],
            in_index=3, channels=arch["head_channels"],
            dilations=(1, 6, 12, 18), contrast=True,
            contrast_dim=arch["dim"], num_classes=2,
            norm_cfg={"type": "BN"},
        ),
    }


def finetune_config_text(arch: dict) -> str:
    """Finetune-twin model config (classifier ASPP head, same backbone)."""
    bb = dict(arch["flax_backbone"])
    bb.pop("norm_cfg", None)
    bb_lines = ", ".join(f"{k}={v!r}" for k, v in bb.items())
    return f"""\
# Auto-written by tools/dice_parity.py: finetune twin of the pretrain
# architecture with the classifier head.
norm_cfg = dict(type="BN", requires_grad=True)
model = dict(
    type="EncoderDecoder",
    backbone=dict({bb_lines}, norm_cfg=norm_cfg, norm_eval=False,
                  style="pytorch"),
    decode_head=dict(
        type="ASPPHead", in_channels={arch['head_in_channels']},
        in_index=3, channels={arch['head_channels']},
        dilations=(1, 6, 12, 18), dropout_ratio=0.1, num_classes=None,
        norm_cfg=norm_cfg, align_corners=False,
        loss_decode=dict(type="CrossEntropyLoss", use_sigmoid=False,
                         loss_weight=1.0),
    ),
    auxiliary_head=None,
    train_cfg=dict(),
    test_cfg=dict(mode="whole"),
)
"""



# child code for one finetune leg: runs the REAL finetune CLI in its own
# process (so the parent can force CPU for the pretrain stages while the
# legs use the default TPU backend) and dumps main()'s metrics to JSON
_CHILD = (
    "import json, os, sys\n"
    "if os.environ.get('DICE_PARITY_CPU'):\n"
    "    import jax; jax.config.update('jax_platforms', 'cpu')\n"
    "from cp2_tpu.train import finetune\n"
    "m = finetune.main(finetune.get_args(sys.argv[2:]))\n"
    "json.dump({k: float(v) for k, v in m.items()}, open(sys.argv[1], 'w'))\n"
)


def _load_img(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0


def make_corpus_batches(files, n_steps: int, batch: int, hw: int,
                        seed: int):
    """CP2 pretrain batches from real corpus images, precomputed in numpy.

    Replicates the reference pipeline's *semantics* (loader.py:50-118 +
    main.py:206-228) in a framework-neutral form: two overlapping crops
    of the same source with exact pixel-id/region-id maps (integer crops,
    no resize, so id geometry is exact on both sides), per-view
    brightness/contrast jitter, p=0.5 hflip of view b, and two background
    streams with a RandomErasing-style zeroed rectangle (forward_cp2
    composites where bg channel 0 == 0, builder.py:1146-1152).
    """
    rng = np.random.RandomState(seed)
    first = _load_img(files[0])
    size = first.shape[0]
    assert size >= hw, f"corpus {size} < crop {hw}"
    base_ids = np.arange(1, size * size + 1, dtype=np.int64).reshape(
        size, size)
    # coarse duplicated region ids (SAM-mask stand-in), 8x8 blocks
    region = ((base_ids - 1) // 8) % 97 + 1

    cache: dict = {files[0]: first}

    def load(f):
        if f not in cache:
            cache[f] = _load_img(f)
        return cache[f]

    def jitter(v):
        c = rng.uniform(0.8, 1.2)
        d = rng.uniform(-0.1, 0.1)
        return np.clip(v * c + d, 0.0, 1.0)

    batches = []
    for _ in range(n_steps):
        img_a = np.empty((batch, hw, hw, 3), np.float32)
        img_b = np.empty_like(img_a)
        ids_a = np.empty((batch, hw, hw), np.int64)
        ids_b = np.empty_like(ids_a)
        reg_a = np.empty_like(ids_a)
        reg_b = np.empty_like(ids_a)
        for j in range(batch):
            src = load(files[rng.randint(len(files))])
            ya, xa = rng.randint(0, size - hw + 1, 2)
            yb = int(np.clip(ya + rng.randint(-hw // 3, hw // 3 + 1),
                             0, size - hw))
            xb = int(np.clip(xa + rng.randint(-hw // 3, hw // 3 + 1),
                             0, size - hw))
            a = jitter(src[ya:ya + hw, xa:xa + hw])
            b = jitter(src[yb:yb + hw, xb:xb + hw])
            ia = base_ids[ya:ya + hw, xa:xa + hw]
            ib = base_ids[yb:yb + hw, xb:xb + hw]
            ra = region[ya:ya + hw, xa:xa + hw]
            rb = region[yb:yb + hw, xb:xb + hw]
            if rng.rand() < 0.5:  # hflip view b, ids ride along
                b, ib, rb = b[:, ::-1], ib[:, ::-1], rb[:, ::-1]
            img_a[j], img_b[j] = a, b
            ids_a[j], ids_b[j] = ia, ib
            reg_a[j], reg_b[j] = ra, rb
        bgs = []
        for _k in range(2):
            bg = np.empty((batch, hw, hw, 3), np.float32)
            for j in range(batch):
                src = load(files[rng.randint(len(files))])
                y0, x0 = rng.randint(0, size - hw + 1, 2)
                # keep non-erased pixels strictly > 0 so the composite
                # mask (bg==0) marks exactly the erased rectangle
                bg[j] = src[y0:y0 + hw, x0:x0 + hw] * 0.9 + 0.05
            eh = rng.randint(hw // 4, 3 * hw // 4 + 1, size=batch)
            ew = rng.randint(hw // 4, 3 * hw // 4 + 1, size=batch)
            for j in range(batch):
                ey = rng.randint(0, hw - eh[j] + 1)
                ex = rng.randint(0, hw - ew[j] + 1)
                bg[j, ey:ey + eh[j], ex:ex + ew[j], :] = 0.0
            bgs.append(bg)
        batches.append({
            "img_a": img_a, "img_b": np.ascontiguousarray(img_b),
            "bg0": bgs[0], "bg1": bgs[1],
            "pixel_ids_a": ids_a,
            "pixel_ids_b": np.ascontiguousarray(ids_b),
            "region_ids_a": reg_a,
            "region_ids_b": np.ascontiguousarray(reg_b),
        })
    return batches


def save_cp2_checkpoint(directory: str, step: int, params_encoder,
                        stats_encoder) -> str:
    """Write an orbax checkpoint in the pretrain CLI's format so the
    finetune CLI's CP2 loading matrix consumes it unmodified."""
    from cp2_tpu.checkpoint.io import save_checkpoint

    state = {
        "params": {"encoder": params_encoder},
        "batch_stats": {"encoder": stats_encoder},
    }
    return save_checkpoint(directory, step, state,
                           meta={"pretrain_type": "CP2", "epoch": step})


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="/tmp/syn_corpus")
    p.add_argument("--steps", type=int, default=300,
                   help="pretrain optimizer steps (identical batches for "
                        "all three pretrains)")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--hw", type=int, default=64,
                   help="pretrain crop size (the twin architecture is "
                        "validated at 64², OS=16)")
    p.add_argument("--lr", type=float, default=0.05,
                   help="pretrain SGD lr (0.05 moves the tiny twin's "
                        "weights appreciably in --steps; both frameworks "
                        "use the identical value)")
    p.add_argument("--ema", type=float, default=0.99,
                   help="key-encoder EMA momentum (0.99 so the key "
                        "encoder tracks within --steps)")
    p.add_argument("--img_size", type=int, default=160)
    p.add_argument("--corpus_size", type=int, default=None,
                   help="generated corpus image size (default: --img_size); "
                        "must be >= --hw for the pretrain crops")
    p.add_argument("--finetune_epochs", type=int, default=40)
    p.add_argument("--finetune_batch", type=int, default=16)
    p.add_argument("--train_ratio", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--arch", choices=sorted(ARCHS), default="tiny18",
                   help="'r50' = the flagship dilated Bottleneck-50 + "
                        "ASPP-512/contrast-128 the reference trains "
                        "(configs/config_pretrain.py)")
    p.add_argument("--n_pert", type=int, default=1,
                   help="independent perturbed-reference chaos-envelope "
                        "replicates (each perturbs a different kernel); "
                        "pass criterion uses the max spread (n>=3 per "
                        "VERDICT r4 weak #3)")
    p.add_argument("--ours_device", choices=["cpu", "default"],
                   default="cpu",
                   help="'default' runs the rebuild's pretrain leg on the "
                        "session's default backend (TPU) instead of CPU — "
                        "cross-hardware f32 conv noise is the same order "
                        "as the 1e-6 perturbation the envelope measures")
    p.add_argument("--device", default=None,
                   help="'cpu' forces the CPU backend for the finetune "
                        "legs too (smoke)")
    p.add_argument("--log_dir", default="/tmp/dice_parity")
    p.add_argument("--out", default=os.path.join(REPO, "reports", "quality"))
    p.add_argument("--smoke", action="store_true",
                   help="tiny everything (plumbing check)")
    p.add_argument("--finetune_seed", type=int, default=None,
                   help="seed for the finetune legs only (default: --seed); "
                        "combine with --reuse_pretrain to measure the "
                        "finetune-seed Dice spread of the SAME checkpoints")
    p.add_argument("--reuse_pretrain", action="store_true",
                   help="skip stages 1-3 and reuse the three checkpoints "
                        "already in --log_dir (they must exist at --steps)")
    p.add_argument("--pretrain_only", action="store_true",
                   help="run stages 1-3 (all pretrain legs + checkpoint "
                        "save) and stop before the finetunes — pairs with "
                        "--reuse_pretrain so the CPU-bound torch legs and "
                        "the TPU finetune legs can be scheduled separately "
                        "on a one-core host")
    p.add_argument("--dryrun", action="store_true",
                   help="validate every finetune argv through the real "
                        "get_args; build/run nothing")
    args = p.parse_args(argv)
    if args.finetune_seed is None:
        args.finetune_seed = args.seed
    if args.corpus_size is None:
        args.corpus_size = args.img_size
    assert args.corpus_size >= args.hw, (args.corpus_size, args.hw)
    if args.smoke:
        args.steps = min(args.steps, 6)
        args.batch = 4
        args.finetune_epochs = min(args.finetune_epochs, 2)
    arch = ARCHS[args.arch]

    os.makedirs(args.log_dir, exist_ok=True)
    cfg_path = os.path.join(
        args.log_dir, f"config_finetune_{args.arch}.py")
    with open(cfg_path, "w") as fh:
        fh.write(finetune_config_text(arch))

    img_dir = os.path.join(args.root, "images")
    mask_dir = os.path.join(args.root, "masks")

    def ft_argv(tag, pretrain_type, pretrain_path=""):
        ft = [
            "--run_id", f"dp_ft_{tag}_s{args.finetune_seed}",
            "--log_dir", args.log_dir,
            "--config", cfg_path,
            "--img_dirs", img_dir, "--mask_dirs", mask_dir,
            "--data_split_type", "FILENAME",
            "--train_data_ratio", str(args.train_ratio),
            "--img_height", str(args.img_size),
            "--img_width", str(args.img_size),
            "--batch_size", str(args.finetune_batch),
            "--epochs", str(args.finetune_epochs),
            "--pretrain_type", pretrain_type,
            "--seed", str(args.finetune_seed),
            "--visualize_freq", "0",
        ]
        if pretrain_path:
            ft += ["--pretrain_path", pretrain_path]
        return ft

    pert_tags = ["pert" if i == 0 else f"pert{i}"
                 for i in range(args.n_pert)]
    legs = ([("ref", "CP2")] + [(t, "CP2") for t in pert_tags]
            + [("ours", "CP2"), ("scratch", "NONE")])
    if args.dryrun:
        from cp2_tpu.train import finetune

        for tag, pt in legs:
            leg = ft_argv(tag, pt, "/dev/null/ckpt" if pt != "NONE" else "")
            finetune.get_args(leg)
            print("[dice_parity dryrun] finetune:", " ".join(leg))
        print(f"[dice_parity dryrun] {len(legs)} finetune argvs OK")
        return {"dryrun": True}

    # ---- stages 1-3: torch legs are CPU by construction; the rebuild's
    # leg runs on CPU too by default (identical f32 conv numerics) unless
    # --ours_device default opts into the TPU backend (cross-hardware f32
    # conv noise is the same order as the 1e-6 perturbation the chaos
    # envelope measures, and is judged against it)
    import jax

    if args.ours_device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    results = {"config": vars(args).copy()}
    if args.reuse_pretrain:
        ckpts = {tag: os.path.join(args.log_dir, f"ckpt_{tag}",
                                   str(args.steps))
                 for tag, pt in legs if pt == "CP2"}
        missing = [p for p in ckpts.values() if not os.path.isdir(p)]
        if missing:
            raise FileNotFoundError(
                f"--reuse_pretrain: checkpoints missing: {missing}")
        part = os.path.join(args.log_dir, "pretrain_stage.json")
        if os.path.exists(part):  # merge the --pretrain_only stage metrics
            with open(part) as fh:
                stage = json.load(fh)
            stage.pop("config", None)
            results.update(stage)
        results["checkpoints"] = ckpts
        print(f"[dice_parity] reusing pretrained checkpoints: {ckpts}")
        return _run_finetunes(args, ckpts, results, ft_argv, legs)

    if not os.path.isdir(img_dir) or not os.listdir(img_dir):
        from tools.make_synthetic_dataset import generate

        print(f"generating corpus at {args.root} ...")
        generate(args.root, args.corpus_size,
                 {"train": 400, "val": 60, "test": 80}, args.seed)

    files = sorted(
        os.path.join(img_dir, f) for f in os.listdir(img_dir)
        if f.startswith("train_"))
    un_dir = os.path.join(args.root, "unlabeled")
    if os.path.isdir(un_dir):
        files += sorted(os.path.join(un_dir, f) for f in os.listdir(un_dir))
    print(f"[dice_parity] {len(files)} pretrain images; building "
          f"{args.steps} identical batches ...")
    batches = make_corpus_batches(files, args.steps, args.batch, args.hw,
                                  seed=1000 + args.seed)

    from tests.test_real_model_trajectory import (
        run_ours_real,
        run_reference_real,
    )

    def _queue(seed=5):
        r = np.random.RandomState(seed)
        q = r.randn(arch["queue_len"], arch["dim"]).astype(np.float32)
        return q / np.linalg.norm(q, axis=1, keepdims=True)

    arch_kw = dict(torch_kw=arch["torch_kw"], dim=arch["dim"],
                   queue_np=_queue())

    t0 = time.time()
    print("[dice_parity] reference pretrain (torch CPU) ...")
    ref = run_reference_real(batches, lr=args.lr, momentum_ema=args.ema,
                             **arch_kw)
    results["ref_pretrain_seconds"] = time.time() - t0
    perts = {}
    for i, tag in enumerate(pert_tags):
        # each replicate perturbs a DIFFERENT kernel (i==0 keeps the
        # historical stem draw); the Dice envelope is the max spread
        pseed = None if i == 0 else i * 37 + 1
        t0 = time.time()
        print(f"[dice_parity] reference+1e-6 pretrain (chaos control "
              f"'{tag}', perturb_seed={pseed}) ...")
        perts[tag] = run_reference_real(
            batches, lr=args.lr, momentum_ema=args.ema,
            perturb=1e-6, perturb_seed=pseed, **arch_kw)
        results[f"{tag}_pretrain_seconds"] = time.time() - t0
        results[f"{tag}_perturb_seed"] = pseed
    t0 = time.time()
    print(f"[dice_parity] rebuild pretrain (JAX {args.ours_device}) ...")
    ours = run_ours_real(batches, ref, lr=args.lr, momentum_ema=args.ema,
                         flax_cfg=flax_pretrain_cfg(arch), dim=arch["dim"],
                         queue_np=_queue())
    results["ours_pretrain_seconds"] = time.time() - t0

    ref_l = np.asarray(ref["losses"])
    our_l = np.asarray(ours["losses"])
    results["pretrain_loss_first"] = float(ref_l[0])
    results["pretrain_loss_last"] = float(ref_l[-1])
    results["pretrain_mean_rel_dev_ours"] = float(
        np.mean(np.abs(our_l - ref_l) / np.abs(ref_l)))
    for tag in pert_tags:
        pert_l = np.asarray(perts[tag]["losses"])
        results[f"pretrain_mean_rel_dev_{tag}"] = float(
            np.mean(np.abs(pert_l - ref_l) / np.abs(ref_l)))

    ckpts = {}
    ckpts["ref"] = save_cp2_checkpoint(
        os.path.join(args.log_dir, "ckpt_ref"), args.steps,
        ref["final_q"], ref["final_stats_q"])
    for tag in pert_tags:
        ckpts[tag] = save_cp2_checkpoint(
            os.path.join(args.log_dir, f"ckpt_{tag}"), args.steps,
            perts[tag]["final_q"], perts[tag]["final_stats_q"])
    state = ours["state"]
    ckpts["ours"] = save_cp2_checkpoint(
        os.path.join(args.log_dir, "ckpt_ours"), args.steps,
        jax.device_get(state.params)["encoder"],
        jax.device_get(state.batch_stats)["encoder"])
    results["checkpoints"] = ckpts

    if args.pretrain_only:
        os.makedirs(args.out, exist_ok=True)
        part = os.path.join(args.log_dir, "pretrain_stage.json")
        with open(part, "w") as fh:
            json.dump(results, fh, indent=1)
        print(f"[dice_parity] --pretrain_only: checkpoints saved; "
              f"pretrain-stage metrics at {part}. Re-run with "
              f"--reuse_pretrain (same --log_dir/--steps/--n_pert) for "
              f"the finetune legs.")
        return results

    return _run_finetunes(args, ckpts, results, ft_argv, legs)


def _run_finetunes(args, ckpts, results, ft_argv, legs):
    """Stage 4: four identical finetune legs (subprocess each so the
    default TPU backend is used while the parent stays on CPU)."""
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    if args.device == "cpu":
        env["DICE_PARITY_CPU"] = "1"
    for tag, pt in legs:
        leg = ft_argv(tag, pt, ckpts.get(tag, ""))
        out_json = os.path.join(
            args.log_dir, f"metrics_{tag}_s{args.finetune_seed}.json")
        print(f"[dice_parity] finetune leg '{tag}' ...")
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, "-c", _CHILD, out_json] + leg,
            cwd=REPO, env=env,
        )
        if proc.returncode != 0:
            raise RuntimeError(f"finetune leg {tag} failed "
                               f"(rc={proc.returncode})")
        with open(out_json) as fh:
            metrics = json.load(fh)
        metrics["seconds"] = time.time() - t0
        results[f"finetune_{tag}"] = metrics

    d_ref = results["finetune_ref"]["test_Dice"]
    d_ours = results["finetune_ours"]["test_Dice"]
    pert_tags = [tag for tag, pt in legs
                 if pt == "CP2" and tag.startswith("pert")]
    spreads = [abs(results[f"finetune_{t}"]["test_Dice"] - d_ref)
               for t in pert_tags]
    results["dice_ours_minus_ref"] = d_ours - d_ref
    results["dice_pert_spreads"] = spreads
    results["dice_chaos_envelope"] = max(spreads)
    results["dice_chaos_envelope_mean"] = float(np.mean(spreads))
    results["north_star_pass"] = bool(
        abs(d_ours - d_ref) <= max(max(spreads), 0.005))

    os.makedirs(args.out, exist_ok=True)
    name = "dice_parity_smoke.json" if args.smoke else "dice_parity.json"
    if args.arch != "tiny18":
        name = name.replace("dice_parity", f"dice_parity_{args.arch}")
    if args.finetune_seed != args.seed:
        name = name.replace(".json", f"_fs{args.finetune_seed}.json")
    with open(os.path.join(args.out, name), "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps({k: v for k, v in results.items() if k != "config"},
                     indent=1))
    return results


if __name__ == "__main__":
    main()
