"""2-process finetune smoke: shared-log_dir best-ckpt restore (VERDICT r3).

``train/finetune.py`` saves the best checkpoint on rank 0 only; non-zero
hosts derive ``best_path`` assuming a shared log_dir and restore it for
the final test pass.  This drives the REAL finetune ``main()`` across two
OS processes (4 virtual CPU devices each) and asserts both ranks finish,
restore the same best checkpoint, and report identical (replicated) test
metrics.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY_FT_CFG = """
norm_cfg = dict(type="BN", requires_grad=True)
model = dict(
    type="EncoderDecoder",
    backbone=dict(
        type="ResNet",
        depth=18,
        stem_channels=8,
        base_channels=8,
        dilations=(1, 1, 1, 2),
        strides=(1, 2, 2, 1),
        norm_cfg=norm_cfg,
        contract_dilation=True,
    ),
    decode_head=dict(
        type="ASPPHead",
        in_channels=64,
        in_index=3,
        channels=16,
        dilations=(1, 6),
        dropout_ratio=0.0,
        num_classes=2,
        norm_cfg=norm_cfg,
    ),
    auxiliary_head=None,
)
"""


@pytest.fixture(scope="module")
def seg_tree(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("mpft_data")
    (root / "images").mkdir()
    (root / "masks").mkdir()
    r = np.random.RandomState(3)
    specs = [("train", 16), ("val", 8), ("test", 8)]
    for split, n in specs:
        for i in range(n):
            name = f"{split}_{i:02d}.png"
            Image.fromarray((r.rand(40, 44, 3) * 255).astype(np.uint8)).save(
                root / "images" / name
            )
            Image.fromarray(
                (r.rand(40, 44) > 0.5).astype(np.uint8) * 255
            ).save(root / "masks" / name)
    return str(root)


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_finetune_best_ckpt_restore(seg_tree, tmp_path):
    log_dir = str(tmp_path / "logs")
    os.makedirs(log_dir, exist_ok=True)
    with open(os.path.join(log_dir, "tiny_finetune_cfg.py"), "w") as f:
        f.write(TINY_FT_CFG)

    port = _free_port()
    outs = [str(tmp_path / f"ft_proc{i}.json") for i in range(2)]
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # workers force cpu via jax.config
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable,
             os.path.join(REPO, "tests", "_mp_finetune_worker.py"),
             str(pid), "2", str(port), seg_tree, log_dir, outs[pid]],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in range(2)
    ]
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=1200)
        logs.append(out.decode(errors="replace"))
    for pid, p in enumerate(procs):
        assert p.returncode == 0, f"worker {pid} failed:\n{logs[pid][-4000:]}"

    results = [json.load(open(o)) for o in outs]
    m0, m1 = results[0]["test_metrics"], results[1]["test_metrics"]
    assert set(m0) == set(m1)
    assert "test_Dice" in m0 and np.isfinite(m0["test_Dice"])
    for k in m0:
        # replicated eval over the global mesh: both ranks must agree
        np.testing.assert_allclose(m0[k], m1[k], rtol=1e-6, err_msg=k)

    # the rank-0 best checkpoint exists in the shared log_dir and is the
    # one both ranks restored (save_top_k=1: exactly one step dir remains)
    run_dir = os.path.join(log_dir, "mpft")
    step_dirs = [d for d in os.listdir(run_dir)
                 if os.path.isdir(os.path.join(run_dir, d)) and d.isdigit()]
    assert len(step_dirs) == 1, step_dirs
    assert os.path.exists(
        os.path.join(run_dir, step_dirs[0], "meta.json")
    )
