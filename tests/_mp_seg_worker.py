"""Worker for the 2-process data-sharding equivalence test.

Run as: python tests/_mp_seg_worker.py <pid> <nprocs> <port> <data_dir> <out_json>

Each process holds 4 virtual CPU devices, bootstraps through
``cp2_tpu.parallel.collectives.initialize`` (the CLI code path), loads only
ITS shard of every global batch, and runs two jitted train steps over the
global 8-device mesh.  The parent test compares the resulting loss/params
against a single-process 8-device run of the same global batches.
"""

import json
import os
import sys


def main():
    pid, nprocs, port, data_dir, out_json = (
        int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]),
        sys.argv[4], sys.argv[5],
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
    assert jax.process_count() == nprocs, jax.process_count()
    assert jax.device_count() == 4 * nprocs

    import numpy as np
    import jax.numpy as jnp
    import optax

    from cp2_tpu.data import HostDataLoader, SegmentationDataSource
    from cp2_tpu.data.datasets import list_image_mask_pairs
    from cp2_tpu.models import build_segmentor
    from cp2_tpu.ops.metrics import ConfusionState
    from cp2_tpu.parallel import create_mesh, shard_batch, shard_pytree
    from cp2_tpu.train.segmentation_task import create_seg_state, make_seg_steps
    from tests._mp_model import GLOBAL_BATCH, HW, STEPS, tiny_cfg

    pairs = list_image_mask_pairs(
        os.path.join(data_dir, "images"), os.path.join(data_dir, "masks")
    )
    local_batch = GLOBAL_BATCH // nprocs
    loader = HostDataLoader(
        SegmentationDataSource(pairs, HW, 2, random_crop=False),
        local_batch, shuffle=False, drop_last=True, seed=0,
        num_workers=1, shard=(pid, nprocs),
    )

    model = build_segmentor(tiny_cfg())
    tx = optax.sgd(0.05)
    sample = jnp.zeros((GLOBAL_BATCH, HW, HW, 3), jnp.float32)
    state = create_seg_state(jax.random.PRNGKey(0), model, tx, sample)
    train_step, _, _ = make_seg_steps(model, tx, 2, (HW, HW))

    mesh = create_mesh(4 * nprocs)
    state = shard_pytree(state, mesh)
    jit_train = jax.jit(train_step, donate_argnums=(0, 3))
    confusion = shard_pytree(ConfusionState.create(2), mesh)

    losses = []
    it = loader.epoch_iterator(0)
    with mesh:
        for step in range(STEPS):
            batch = next(it)
            batch = shard_batch(
                {"image": batch["image"].astype(np.float32) / 255.0,
                 "mask": batch["mask"]},
                mesh,
            )
            state, confusion, m = jit_train(
                state, batch, jax.random.PRNGKey(step), confusion
            )
            losses.append(float(m["loss"]))

    kernel = np.asarray(
        jax.device_get(state.params["backbone"]["conv1"]["conv"]["kernel"])
    )
    result = {
        "process": pid,
        "losses": losses,
        "confusion": np.asarray(jax.device_get(confusion.matrix)).tolist(),
        "kernel_sum": float(np.float64(kernel.astype(np.float64).sum())),
        "kernel_digest": kernel.tobytes().hex()[:64],
    }
    with open(out_json, "w") as f:
        json.dump(result, f)
    print(f"[worker {pid}] done: losses={losses}", flush=True)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
