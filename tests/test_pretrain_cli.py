"""Pretrain CLI end-to-end via ``--debug`` on the 8-device CPU mesh.

The reference's ``--debug`` (main.py:47,724-729) runs a single-rank
in-process fake cluster as its integration smoke.  Ours bounds the run to
batch 8 / 1 epoch / 3 steps (cp2_tpu/train/pretrain.py get_args) so one
``main(args)`` call exercises the whole loop: data source → host loader →
fused on-device augmentation → CP2 step → metrics sink → checkpoint save.
"""

import glob
import json
import os

import numpy as np
import pytest

TINY_PRETRAIN_CFG = """
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
        contrast=True,
        # must equal the SSL embedding dim (the queue width is fixed at 128,
        # like reference main.py:404); SSLEncoder validates this
        contrast_dim=128,
        dilations=(1, 6),
        num_classes=2,
        norm_cfg=norm_cfg,
    ),
    auxiliary_head=None,
)
"""


@pytest.fixture(scope="module")
def unlabeled_tree(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("pretrain_imgs")
    r = np.random.RandomState(0)
    # 24 images / batch 8 -> 3 steps, so the epoch aggregate averages more
    # than one step (the semantics test_pretrain_debug_smoke pins)
    for i in range(24):
        Image.fromarray((r.rand(40, 48, 3) * 255).astype(np.uint8)).save(
            root / f"img{i:02d}.png"
        )
    return str(root)


@pytest.mark.slow
def test_pretrain_debug_smoke_8dev(unlabeled_tree, tmp_path):
    import jax

    assert jax.device_count() >= 8
    from cp2_tpu.train import pretrain

    cfg_path = tmp_path / "tiny_pretrain.py"
    cfg_path.write_text(TINY_PRETRAIN_CFG)
    args = pretrain.get_args([
        "--run_id", "dbg",
        "--log_dir", str(tmp_path / "logs"),
        "--data_dirs", unlabeled_tree,
        "--config", str(cfg_path),
        "--debug",
        "--img_height", "32", "--img_width", "32",
        "--num-workers", "2",
        "--pretrain_from_scratch",
        "--cap_queue",
        "--no-bf16",
    ])
    # --debug bounded the run (reference main.py:724-729 smoke semantics)
    assert args.batch_size == 8
    assert args.epochs == 1 and args.max_steps == 3

    state = pretrain.main(args)
    assert int(state.step) >= 1

    run_dir = os.path.join(str(tmp_path / "logs"), "dbg")
    # end-of-run checkpoint written
    assert glob.glob(os.path.join(run_dir, "*", "_CHECKPOINT_METADATA")) or \
        glob.glob(os.path.join(run_dir, "*"))
    # metrics sink carries finite per-step training losses
    with open(os.path.join(run_dir, "metrics.jsonl")) as fh:
        rows = [json.loads(line) for line in fh]
    losses = [row["train/loss_step"] for row in rows if "train/loss_step" in row]
    assert losses and all(np.isfinite(v) for v in losses)
    # exact epoch aggregate (reference on_train_epoch_end averages EVERY
    # step, builder.py:1608-1664): --debug logs every step (scalar_freq 1),
    # so the epoch mean must equal the mean of the step rows
    epoch_rows = [row for row in rows
                  if "train/loss" in row and "train/loss_step" not in row]
    assert epoch_rows, "no epoch-aggregate row logged"
    np.testing.assert_allclose(
        epoch_rows[-1]["train/loss"], np.mean(losses), rtol=1e-5
    )
    for key in ("train/acc_ins", "train/acc_seg", "train/loss_ins",
                "train/loss_dense", "train/cross_image_variance_source"):
        assert key in epoch_rows[-1], key
