"""Finetune CLI end-to-end on the 8-device CPU mesh.

Drives ``cp2_tpu.train.finetune.main`` the way a user would (reference
``finetune.py --fast_dev_run``): tiny synthetic polyp tree with splits
whose sizes do NOT divide the batch size, so the ragged val/test/pseudo
batches exercise the pad-and-mask eval path across all 8 devices.
"""

import json
import os

import numpy as np
import pytest

TINY_CFG = """
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
        num_classes=None,
        norm_cfg=norm_cfg,
    ),
    auxiliary_head=None,
)
"""


@pytest.fixture(scope="module")
def polyp_tree(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("polyp")
    img_dir = root / "images"
    mask_dir = root / "masks"
    img_dir.mkdir()
    mask_dir.mkdir()
    r = np.random.RandomState(0)
    # split sizes chosen so val (3) and test (5) are NOT batch-divisible
    for split, count in (("train", 10), ("val", 3), ("test", 5)):
        for i in range(count):
            name = f"{split}{i:02d}_{split}.png"
            Image.fromarray((r.rand(48, 56, 3) * 255).astype(np.uint8)).save(
                img_dir / name
            )
            Image.fromarray(
                (r.rand(48, 56) > 0.5).astype(np.uint8) * 255
            ).save(mask_dir / name)
    return str(img_dir), str(mask_dir)


@pytest.mark.slow
def test_finetune_fast_dev_run_8dev(polyp_tree, tmp_path):
    import jax

    assert jax.device_count() >= 8
    from cp2_tpu.train import finetune

    img_dir, mask_dir = polyp_tree
    cfg_path = tmp_path / "tiny_finetune.py"
    cfg_path.write_text(TINY_CFG)
    args = finetune.get_args([
        "--run_id", "e2e",
        "--log_dir", str(tmp_path / "logs"),
        "--img_dirs", img_dir,
        "--mask_dirs", mask_dir,
        "--pretrain_type", "NONE",
        "--config", str(cfg_path),
        "--batch_size", "8",
        "--img_height", "32", "--img_width", "32",
        "--num_workers", "2",
        "--fast_dev_run",
        "--visualize_freq", "0",
        "--no-bf16",
    ])
    test_metrics = finetune.main(args)
    assert np.isfinite(test_metrics["test_loss"])
    assert 0.0 <= test_metrics["test_BinaryJaccardIndex"] <= 1.0
    # the JSONL sink must carry val metrics from the padded val loop
    metrics_file = os.path.join(str(tmp_path / "logs"), "e2e", "metrics.jsonl")
    rows = [json.loads(l) for l in open(metrics_file)]
    assert any("val_BinaryJaccardIndex" in r for r in rows)
