"""Multi-host data sharding: 2-process run == single-process run.

The last unbuilt piece of the distributed story in round 2 (VERDICT #1):
loaders shard the index stream per process, ``shard_batch`` assembles the
global batch via ``jax.make_array_from_process_local_data``, and this test
proves the full train path — two OS processes x 4 virtual CPU devices
each, bootstrapped through ``collectives.initialize`` with cross-process
Gloo collectives — reproduces the single-process 8-device result on the
SAME global batches (reference equivalent: DistributedSampler + DDP,
main.py:260-279).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from tests._mp_model import GLOBAL_BATCH, HW, STEPS, tiny_cfg

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def seg_tree(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("mpdata")
    (root / "images").mkdir()
    (root / "masks").mkdir()
    r = np.random.RandomState(0)
    for i in range(16):
        name = f"train{i:02d}_train.png"
        Image.fromarray((r.rand(40, 44, 3) * 255).astype(np.uint8)).save(
            root / "images" / name
        )
        Image.fromarray((r.rand(40, 44) > 0.5).astype(np.uint8) * 255).save(
            root / "masks" / name
        )
    return str(root)


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _single_process_reference(data_dir):
    """Same global batches on the in-process 8-device mesh.

    The global batch under 2-host assembly is concat(shard0_rows,
    shard1_rows); build exactly that here from two shard-view loaders so
    array contents and device layout match the multi-process run."""
    import jax
    import jax.numpy as jnp
    import optax

    from cp2_tpu.data import HostDataLoader, SegmentationDataSource
    from cp2_tpu.data.datasets import list_image_mask_pairs
    from cp2_tpu.models import build_segmentor
    from cp2_tpu.ops.metrics import ConfusionState
    from cp2_tpu.parallel import create_mesh, shard_batch, shard_pytree
    from cp2_tpu.train.segmentation_task import create_seg_state, make_seg_steps

    pairs = list_image_mask_pairs(
        os.path.join(data_dir, "images"), os.path.join(data_dir, "masks")
    )
    local_batch = GLOBAL_BATCH // 2
    loaders = [
        HostDataLoader(
            SegmentationDataSource(pairs, HW, 2, random_crop=False),
            local_batch, shuffle=False, drop_last=True, seed=0,
            num_workers=1, shard=(pid, 2),
        )
        for pid in range(2)
    ]

    model = build_segmentor(tiny_cfg())
    tx = optax.sgd(0.05)
    sample = jnp.zeros((GLOBAL_BATCH, HW, HW, 3), jnp.float32)
    state = create_seg_state(jax.random.PRNGKey(0), model, tx, sample)
    train_step, _, _ = make_seg_steps(model, tx, 2, (HW, HW))

    mesh = create_mesh(8)
    state = shard_pytree(state, mesh)
    jit_train = jax.jit(train_step, donate_argnums=(0, 3))
    confusion = shard_pytree(ConfusionState.create(2), mesh)

    losses = []
    its = [ld.epoch_iterator(0) for ld in loaders]
    with mesh:
        for step in range(STEPS):
            rows = [next(it) for it in its]
            batch = {
                "image": np.concatenate(
                    [r["image"] for r in rows]
                ).astype(np.float32) / 255.0,
                "mask": np.concatenate([r["mask"] for r in rows]),
            }
            batch = shard_batch(batch, mesh)
            state, confusion, m = jit_train(
                state, batch, jax.random.PRNGKey(step), confusion
            )
            losses.append(float(m["loss"]))
    kernel = np.asarray(
        jax.device_get(state.params["backbone"]["conv1"]["conv"]["kernel"])
    )
    return {
        "losses": losses,
        "confusion": np.asarray(jax.device_get(confusion.matrix)).tolist(),
        "kernel_sum": float(np.float64(kernel.astype(np.float64).sum())),
        "kernel_digest": kernel.tobytes().hex()[:64],
    }


@pytest.mark.slow
def test_two_process_matches_single_process(seg_tree, tmp_path):
    port = _free_port()
    outs = [str(tmp_path / f"proc{i}.json") for i in range(2)]
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # workers force cpu via jax.config
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "_mp_seg_worker.py"),
             str(pid), "2", str(port), seg_tree, outs[pid]],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in range(2)
    ]
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        logs.append(out.decode(errors="replace"))
    for pid, p in enumerate(procs):
        assert p.returncode == 0, f"worker {pid} failed:\n{logs[pid][-4000:]}"

    results = [json.load(open(o)) for o in outs]
    # both processes observe identical (replicated) losses and state
    assert results[0]["losses"] == results[1]["losses"]
    assert results[0]["kernel_digest"] == results[1]["kernel_digest"]

    ref = _single_process_reference(seg_tree)
    # the sharded-input multi-process run must reproduce the single-process
    # global-batch run; bit-equality expected (same program, same layout),
    # tolerance guards against collective reduction-order differences
    np.testing.assert_allclose(
        results[0]["losses"], ref["losses"], rtol=1e-6, atol=1e-7
    )
    np.testing.assert_allclose(
        results[0]["confusion"], ref["confusion"], rtol=0, atol=0.5
    )
    # params after 2 SGD steps: cross-process (Gloo) collectives reduce in
    # a different order than the in-process backend, so f32 gradients
    # accumulate ~1e-5 relative drift — tolerance covers reduction order,
    # not data-routing errors (those would be O(1): different rows)
    np.testing.assert_allclose(
        results[0]["kernel_sum"], ref["kernel_sum"], rtol=1e-4
    )
    if results[0]["kernel_digest"] == ref["kernel_digest"]:
        print("multi-process run is BIT-IDENTICAL to single-process")
