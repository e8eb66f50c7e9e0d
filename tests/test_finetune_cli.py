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
        "--raw_cache_dir", str(tmp_path / "rawcache"),
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


@pytest.fixture(scope="module")
def lemon_tree(tmp_path_factory):
    """Non-square multi-class defect data (reference lemon: 544x1024 with
    12 classes; scaled down here, geometry preserved)."""
    from PIL import Image

    root = tmp_path_factory.mktemp("lemon")
    img_dir = root / "images"
    mask_dir = root / "masks"
    img_dir.mkdir()
    mask_dir.mkdir()
    r = np.random.RandomState(1)
    for split, count in (("train", 10), ("val", 3), ("test", 4)):
        for i in range(count):
            name = f"{split}{i:02d}_{split}.png"
            # source frames wider than tall, like the lemon camera data
            Image.fromarray((r.rand(60, 110, 3) * 255).astype(np.uint8)).save(
                img_dir / name
            )
            Image.fromarray(
                r.randint(0, 12, (60, 110)).astype(np.uint8), mode="L"
            ).save(mask_dir / name)
    return str(img_dir), str(mask_dir)


@pytest.mark.slow
def test_finetune_lemon_nonsquare_fast_dev_run(lemon_tree, tmp_path):
    """--lemon_data runs TRUE non-square geometry end-to-end: direct
    resize (no crop), 12-class masks, the lemon aug stack (reference
    finetune_dataset.py:346-384).  The reference forces 544x1024; the test
    shrinks to 32x64 to keep CPU compiles tractable while preserving the
    2:1-ish aspect and every lemon-specific code path."""
    from cp2_tpu.train import finetune

    img_dir, mask_dir = lemon_tree
    cfg_path = tmp_path / "tiny_finetune.py"
    cfg_path.write_text(TINY_CFG)
    args = finetune.get_args([
        "--run_id", "lemon",
        "--log_dir", str(tmp_path / "logs"),
        "--img_dirs", img_dir,
        "--mask_dirs", mask_dir,
        "--pretrain_type", "NONE",
        "--config", str(cfg_path),
        "--batch_size", "8",
        "--num_workers", "2",
        "--lemon_data",
        "--fast_dev_run",
        "--visualize_freq", "0",
        "--no-bf16",
    ])
    assert (args.img_height, args.img_width) == (544, 1024)  # reference law
    assert args.num_classes == 12
    # shrink geometry for the CPU test; aspect stays non-square
    args.img_height, args.img_width = 32, 64
    test_metrics = finetune.main(args)
    assert np.isfinite(test_metrics["test_loss"])
    assert 0.0 <= test_metrics["test_MulticlassJaccardIndex"] <= 1.0


@pytest.mark.slow
def test_finetune_refuses_zero_tensor_pretrain_load(polyp_tree, tmp_path):
    """A U-Net-backbone pretrain checkpoint cannot initialize the
    DeepLabV3 finetune segmentor; the reference silently trains from
    random init there (strict=False, segment_network.py:92) — our CLI
    must raise instead of proceeding."""
    import jax
    import jax.numpy as jnp

    from cp2_tpu.checkpoint import save_checkpoint
    from cp2_tpu.ssl import SSLEncoder, SSLHyperParams, create_pretrain_state
    from cp2_tpu.ssl.train_step import make_optimizer
    from cp2_tpu.train import finetune
    from cp2_tpu.types import BackboneType, PretrainType

    hp = SSLHyperParams.for_variant(
        PretrainType.CP2, dim=8, queue_len=16,
        backbone_type=BackboneType.UNET_ENCODER_ONLY,
    )
    model = SSLEncoder(
        model_cfg=None, pretrain_type=PretrainType.CP2,
        backbone_type=BackboneType.UNET_ENCODER_ONLY, dim=8,
    )
    state = create_pretrain_state(
        jax.random.PRNGKey(0), model, make_optimizer("sgd", 0.1), hp,
        jnp.zeros((1, 32, 32, 3), jnp.float32),
        init_fn=lambda m, r, x: m.init(r, x, method="init_all"),
    )
    ckpt_dir = str(tmp_path / "unet_pretrain")
    save_checkpoint(
        ckpt_dir, 1, jax.device_get(state),
        meta={"epoch": 1, "pretrain_type": "CP2",
              "backbone_type": "UNET_ENCODER_ONLY"},
    )

    img_dir, mask_dir = polyp_tree
    cfg_path = tmp_path / "tiny_finetune.py"
    cfg_path.write_text(TINY_CFG)
    args = finetune.get_args([
        "--run_id", "refuse",
        "--log_dir", str(tmp_path / "logs"),
        "--img_dirs", img_dir,
        "--mask_dirs", mask_dir,
        "--pretrain_type", "CP2",
        "--pretrain_path", ckpt_dir,
        "--config", str(cfg_path),
        "--batch_size", "8",
        "--img_height", "32", "--img_width", "32",
        "--fast_dev_run",
        "--visualize_freq", "0",
        "--no-bf16",
    ])
    with pytest.raises(ValueError, match="ZERO tensors"):
        finetune.main(args)
