"""End-to-end drive of the mmseg-style iter-based CLI (tools/train.py).

Reference workflow: tools/dist_train.sh -> tools/train.py ->
train_segmentor (mmseg_/apis/train.py:34-120) — config file in, poly LR
iter loop, periodic mIoU eval + checkpoints out.  This test runs the
whole CLI in-process on a tiny synthetic VOC-style tree and asserts the
artifacts appear.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


@pytest.mark.slow
def test_iter_train_cli_end_to_end(tmp_path):
    from PIL import Image

    img_dir = tmp_path / "images"
    ann_dir = tmp_path / "masks"
    img_dir.mkdir()
    ann_dir.mkdir()
    r = np.random.RandomState(0)
    for i in range(16):
        Image.fromarray((r.rand(40, 40, 3) * 255).astype(np.uint8)).save(
            img_dir / f"im{i:02d}.png"
        )
        Image.fromarray((r.rand(40, 40) > 0.5).astype(np.uint8)).save(
            ann_dir / f"im{i:02d}.png"
        )

    cfg_path = tmp_path / "tiny_cfg.py"
    cfg_path.write_text(
        f"""
norm_cfg = dict(type="BN", requires_grad=True)
model = dict(
    type="EncoderDecoder",
    backbone=dict(
        type="ResNet", depth=18, stem_channels=8, base_channels=8,
        num_stages=4, out_indices=(0, 1, 2, 3),
        dilations=(1, 1, 1, 2), strides=(1, 2, 2, 1),
        norm_cfg=norm_cfg, contract_dilation=True,
    ),
    decode_head=dict(
        type="ASPPHead", in_channels=64, in_index=3, channels=16,
        dilations=(1, 6), num_classes=2, norm_cfg=norm_cfg,
    ),
    auxiliary_head=None,
    train_cfg=dict(),
    test_cfg=dict(mode="whole"),
)
data = dict(
    train=dict(img_dir={str(img_dir)!r}, ann_dir={str(ann_dir)!r},
               img_size=32, batch_size=8),
    val=dict(img_dir={str(img_dir)!r}, ann_dir={str(ann_dir)!r}),
)
optimizer = dict(type="SGD", lr=0.01, momentum=0.9, weight_decay=0.0)
lr_config = dict(policy="poly", power=0.9, min_lr=1e-4)
runner = dict(type="IterBasedRunner", max_iters=3)
checkpoint_config = dict(by_epoch=False, interval=2)
evaluation = dict(interval=2, metric="mIoU")
"""
    )

    from tools.train import get_args, main

    work_dir = tmp_path / "work"
    main(get_args([str(cfg_path), "--work-dir", str(work_dir), "--seed", "0"]))

    # checkpoints written at the configured interval + at max_iters
    ckpts = [d for d in os.listdir(work_dir) if d.isdigit()]
    assert ckpts, f"no checkpoints in {os.listdir(work_dir)}"
    # the training log records losses and the final mIoU table
    text = (work_dir / "log-train.txt").read_text()
    assert "final eval" in text and "mIoU" in text

    # mmseg resume semantics: --resume-from restores weights + optimizer +
    # iteration counter and continues to the (raised) max_iters
    cfg2 = cfg_path.read_text().replace("max_iters=3", "max_iters=5")
    cfg_path.write_text(cfg2)
    resume_dir = work_dir / str(max(int(c) for c in ckpts))
    main(get_args([
        str(cfg_path), "--work-dir", str(work_dir), "--seed", "0",
        "--resume-from", str(resume_dir),
    ]))
    new_ckpts = {int(d) for d in os.listdir(work_dir) if d.isdigit()}
    assert 5 in new_ckpts, f"resume did not reach max_iters: {new_ckpts}"
