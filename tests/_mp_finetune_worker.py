"""Worker for the 2-process finetune smoke test.

Run as: python tests/_mp_finetune_worker.py <pid> <nprocs> <port> <data_dir>
        <log_dir> <out_json>

Each process holds 4 virtual CPU devices and runs the REAL finetune CLI
main() — per-process input sharding, rank-0 best-checkpoint saves, and
the multi-host best-ckpt restore path (train/finetune.py: non-zero hosts
derive best_path assuming a shared log_dir) that VERDICT r3 flagged as
untested.
"""

import json
import os
import sys


def main():
    pid, nprocs, port, data_dir, log_dir, out_json = (
        int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]),
        sys.argv[4], sys.argv[5], sys.argv[6],
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)
    jax.config.update("jax_threefry_partitionable", True)

    from cp2_tpu.parallel.collectives import initialize

    assert initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nprocs,
        process_id=pid,
    )
    assert jax.process_count() == nprocs

    from cp2_tpu.train import finetune

    cfg_path = os.path.join(log_dir, "tiny_finetune_cfg.py")
    args = finetune.get_args([
        "--run_id", "mpft",
        "--log_dir", log_dir,
        "--img_dirs", os.path.join(data_dir, "images"),
        "--mask_dirs", os.path.join(data_dir, "masks"),
        "--config", cfg_path,
        "--data_split_type", "FILENAME",
        "--pretrain_type", "NONE",
        "--epochs", "2",
        "--batch_size", "8",
        "--img_height", "32", "--img_width", "32",
        "--num_workers", "1",
        "--visualize_freq", "0",
        "--no-bf16",
        "--no-native_loader",
    ])
    metrics = finetune.main(args)
    with open(out_json, "w") as f:
        json.dump({"process": pid,
                   "test_metrics": {k: float(v) for k, v in metrics.items()}},
                  f)
    print(f"[worker {pid}] done: {metrics}", flush=True)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
