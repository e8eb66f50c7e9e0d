"""North-star quality gate: CP2 pretrain → finetune → test Dice, end to end.

Runs the REAL CLIs (``cp2_tpu.train.pretrain`` / ``finetune``) on the
deterministic synthetic segmentation corpus
(``tools/make_synthetic_dataset.py``) and reports:

* test Dice / IoU of a finetune initialized from the CP2-pretrained
  checkpoint,
* test Dice / IoU of the identical finetune from scratch
  (``--pretrain_type NONE``) — the control that shows the pretraining
  signal transfers,

into ``reports/quality/quality_gate.json``.  This is the measured half of
BASELINE.json's north star ("finetune Dice within 0.5 pts of reference");
the other half — that the pretraining DYNAMICS match the reference — is
``tools/loss_curve_parity.py`` + tests/test_real_model_trajectory.py,
since the reference's own training stack (CUDA torch + Lightning + mmcv)
cannot execute in this environment.

Intended to run on the real TPU chip (the default backend); pass
``--device cpu`` for a smoke run.

Example (full run, ~20-40 min on one v5e through the tunnel):
``PYTHONPATH=/root/repo:$PYTHONPATH python tools/quality_gate.py \
  --root /tmp/syn_corpus --pretrain_epochs 60 --finetune_epochs 40``
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="/tmp/syn_corpus")
    p.add_argument("--size", type=int, default=160)
    p.add_argument("--n_train", type=int, default=400)
    p.add_argument("--n_val", type=int, default=60)
    p.add_argument("--n_test", type=int, default=80)
    p.add_argument("--n_unlabeled", type=int, default=0,
                   help="extra pretrain-only unlabeled images (mirrors the "
                        "reference's large-unlabeled-pool regime; 0 = "
                        "pretrain on the labeled train images only)")
    p.add_argument("--img_size", type=int, default=160)
    p.add_argument("--pretrain_epochs", type=int, default=60)
    p.add_argument("--pretrain_batch", type=int, default=32)
    p.add_argument("--finetune_epochs", type=int, default=40)
    p.add_argument("--finetune_batch", type=int, default=16)
    p.add_argument("--train_ratio", type=float, default=1.0,
                   help="finetune label fraction (reference sweeps "
                        "0.3/0.6/1.0)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--pretrain_seed", type=int, default=None,
                   help="seed of the pretrain checkpoint to train/reuse; "
                        "defaults to --seed. Setting it lets finetune-seed "
                        "replicates share one pretrained checkpoint, the "
                        "same shape as the reference's seed sweeps "
                        "(scripts/polyp.sh finetunes seeds 0-2 from one "
                        "pretrain run)")
    p.add_argument("--device", default=None,
                   help="'cpu' forces the CPU backend (smoke)")
    p.add_argument("--log_dir", default="/tmp/quality_gate")
    p.add_argument("--skip_scratch", action="store_true")
    p.add_argument("--scratch_from", default="",
                   help="path to a prior quality_gate JSON whose "
                        "finetune_scratch is reused (the scratch control "
                        "is pretrain-independent)")
    p.add_argument("--reuse_pretrain", action="store_true",
                   help="skip pretraining if a checkpoint already exists "
                        "under <log_dir>/qg_pretrain_<seed> (resume after "
                        "an interrupted run)")
    p.add_argument("--out", default=os.path.join(REPO, "reports", "quality"))
    p.add_argument("--corpus_version", type=int, default=1,
                   choices=(1, 2, 3, 4),
                   help="synthetic-corpus generation version (2 = hard "
                        "corpus, VERDICT r4 next #2); also tags the output "
                        "JSON so v2 rows never clobber v1 artifacts")
    p.add_argument("--dryrun", action="store_true",
                   help="build + validate every CLI argv through the real "
                        "get_args (flag-rot guard), generate nothing, run "
                        "nothing")
    args = p.parse_args(argv)

    if args.device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    from tools.make_synthetic_dataset import generate, generate_unlabeled

    img_dir = os.path.join(args.root, "images")
    if not args.dryrun and (
            not os.path.isdir(img_dir) or not os.listdir(img_dir)):
        print(f"generating corpus at {args.root} ...")
        generate(args.root, args.size,
                 {"train": args.n_train, "val": args.n_val,
                  "test": args.n_test}, args.seed,
                 version=args.corpus_version)

    pretrain_dirs = [img_dir]
    if args.n_unlabeled:
        un_dir = os.path.join(args.root, "unlabeled")
        have = len(os.listdir(un_dir)) if os.path.isdir(un_dir) else 0
        if have < args.n_unlabeled and not args.dryrun:
            print(f"generating {args.n_unlabeled} unlabeled pretrain "
                  f"images at {un_dir} ...")
            generate_unlabeled(args.root, args.size, args.n_unlabeled,
                               args.seed, version=args.corpus_version)
        pretrain_dirs.append(un_dir)

    from cp2_tpu.train import finetune, pretrain

    results = {"config": vars(args).copy()}
    pretrain_seed = (args.seed if args.pretrain_seed is None
                     else args.pretrain_seed)
    # ratio-tag the finetune run ids so sweep legs do not share checkpoint
    # directories (the pretrain leg is ratio-independent and stays shared)
    run_tag = f"s{pretrain_seed}"
    if args.n_unlabeled:
        run_tag = f"u{args.n_unlabeled}_{run_tag}"
    ft_tag = f"s{args.seed}"
    if args.n_unlabeled:
        ft_tag = f"u{args.n_unlabeled}_{ft_tag}"
    if args.train_ratio != 1.0:
        ft_tag = f"r{args.train_ratio}_{ft_tag}"

    # ---- 1. CP2 pretrain on the unlabeled train images -------------------
    pre_dir = os.path.join(args.log_dir, f"qg_pretrain_{run_tag}")

    def _list_ckpts():
        if not os.path.isdir(pre_dir):
            return []
        return sorted(
            (d for d in os.listdir(pre_dir)
             if os.path.isdir(os.path.join(pre_dir, d)) and d.isdigit()),
            key=int,
        )

    def _finished_ckpt():
        """Last checkpoint, only if its meta says the full epoch budget ran
        (a mid-run periodic save must trigger a RESUME, not a reuse)."""
        ckpts = _list_ckpts()
        if not ckpts:
            return None
        last = os.path.join(pre_dir, ckpts[-1])
        meta_path = os.path.join(last, "meta.json")
        if os.path.exists(meta_path):
            with open(meta_path) as fh:
                if json.load(fh).get("epoch", -1) >= args.pretrain_epochs:
                    return last
        return None

    t0 = time.time()
    pre_args = pretrain.get_args([
        "--run_id", f"qg_pretrain_{run_tag}",
        "--log_dir", args.log_dir,
        "--data_dirs", *pretrain_dirs,
        "--directory_type", "FILENAME",
        "--pretrain_type", "CP2",
        "--img_height", str(args.img_size), "--img_width", str(args.img_size),
        "--batch-size", str(args.pretrain_batch),
        "--epochs", str(args.pretrain_epochs),
        "--pretrain_from_scratch", "--cap_queue",
        "--seed", str(pretrain_seed),
        "--scalar-freq", "10",
        # crash/wedge insurance: periodic saves + resume-from-latest make
        # the gate idempotent — relaunching the same command continues
        "--ckpt-freq", "8",
        "--resume", pre_dir,
    ])
    mask_dir = os.path.join(args.root, "masks")

    def ft_argv(tag, pretrain_type, pretrain_path=""):
        ft = [
            "--run_id", f"qg_ft_{tag}_{ft_tag}",
            "--log_dir", args.log_dir,
            "--img_dirs", img_dir, "--mask_dirs", mask_dir,
            "--data_split_type", "FILENAME",
            "--train_data_ratio", str(args.train_ratio),
            "--img_height", str(args.img_size),
            "--img_width", str(args.img_size),
            "--batch_size", str(args.finetune_batch),
            "--epochs", str(args.finetune_epochs),
            "--pretrain_type", pretrain_type,
            "--seed", str(args.seed),
            "--visualize_freq", "0",
        ]
        if pretrain_path:
            ft += ["--pretrain_path", pretrain_path]
        return ft

    if args.dryrun:
        # flag-rot guard: every argv above must survive the real parsers
        # (+ their hparam validation webs); nothing is generated or run
        for leg in (ft_argv("cp2", "CP2", "/dev/null/ckpt"),
                    ft_argv("scratch", "NONE")):
            finetune.get_args(leg)
            print("[quality_gate dryrun] finetune:", " ".join(leg))
        print("[quality_gate dryrun] pretrain argv + 2 finetune argvs OK")
        return {"dryrun": True, "pre_args": pre_args}

    if args.reuse_pretrain and _finished_ckpt():
        print(f"[quality_gate] reusing pretrain checkpoint under {pre_dir}")
        results["pretrain_seconds"] = None
    else:
        print(f"[quality_gate] pretraining CP2 for {args.pretrain_epochs} "
              "epochs ...")
        pretrain.main(pre_args)
        results["pretrain_seconds"] = time.time() - t0
    pretrain_path = _finished_ckpt()
    if pretrain_path is None:
        raise RuntimeError(
            f"no FINISHED ({args.pretrain_epochs}-epoch) pretrain "
            f"checkpoint under {pre_dir}")
    results["pretrain_ckpt"] = pretrain_path

    # capture the pretrain loss curve for the report
    losses = []
    with open(os.path.join(pre_dir, "metrics.jsonl")) as fh:
        for line in fh:
            row = json.loads(line)
            if "train/loss_step" in row:
                losses.append(row["train/loss_step"])
    results["pretrain_loss_first"] = losses[0] if losses else None
    results["pretrain_loss_last"] = losses[-1] if losses else None

    def run_finetune(tag, pretrain_type, pretrain_path=""):
        ft = ft_argv(tag, pretrain_type, pretrain_path)
        t0 = time.time()
        metrics = finetune.main(finetune.get_args(ft))
        metrics = {k: float(v) for k, v in metrics.items()}
        metrics["seconds"] = time.time() - t0
        return metrics

    # ---- 2. finetune from the CP2 checkpoint ------------------------------
    print("[quality_gate] finetuning from the CP2 checkpoint ...")
    results["finetune_cp2"] = run_finetune("cp2", "CP2", pretrain_path)

    # ---- 3. control: identical finetune from scratch ----------------------
    if args.scratch_from:
        with open(args.scratch_from) as fh:
            prior = json.load(fh)
        assert prior["config"]["train_ratio"] == args.train_ratio, (
            "scratch_from ratio mismatch")
        results["finetune_scratch"] = dict(prior["finetune_scratch"],
                                           imported_from=args.scratch_from)
    elif not args.skip_scratch:
        print("[quality_gate] finetuning from scratch (control) ...")
        results["finetune_scratch"] = run_finetune("scratch", "NONE")
    if "finetune_scratch" in results:
        results["dice_gain_over_scratch"] = (
            results["finetune_cp2"].get("test_Dice", float("nan"))
            - results["finetune_scratch"].get("test_Dice", float("nan"))
        )

    os.makedirs(args.out, exist_ok=True)
    out_path = os.path.join(args.out, "quality_gate.json")
    # keep one file per pool/ratio/seed so sweeps do not clobber each other
    if (args.train_ratio != 1.0 or args.seed != 0 or args.n_unlabeled
            or args.corpus_version != 1):
        pool = f"u{args.n_unlabeled}_" if args.n_unlabeled else ""
        ver = f"v{args.corpus_version}_" if args.corpus_version != 1 else ""
        out_path = os.path.join(
            args.out,
            f"quality_gate_{ver}{pool}r{args.train_ratio}_s{args.seed}.json",
        )
    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps({k: v for k, v in results.items() if k != "config"},
                     indent=1))
    return results


if __name__ == "__main__":
    main()
