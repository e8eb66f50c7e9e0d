"""Inference utilities: whole vs slide equivalence, TTA test loop."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cp2_tpu.models import build_segmentor
from cp2_tpu.train.inference import slide_inference, whole_inference

from tests.test_finetune_task import TINY_SEG, HW


@pytest.mark.slow
def test_slide_covers_whole_image_and_matches_on_uniform_windows():
    model = build_segmentor(TINY_SEG)
    x = jnp.asarray(np.random.RandomState(0).rand(1, HW, HW, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    whole = whole_inference(model, variables, x)
    assert whole.shape == (1, HW, HW, 2)

    # slide with window == image must equal whole inference exactly
    slid = slide_inference(
        model, variables, x, crop_size=(HW, HW), stride=(HW, HW), num_classes=2
    )
    np.testing.assert_allclose(np.asarray(slid), np.asarray(whole), atol=1e-5)

    # overlapping windows: finite everywhere, correct shape (count-normalized)
    slid2 = slide_inference(
        model, variables, x, crop_size=(HW // 2, HW // 2),
        stride=(HW // 4, HW // 4), num_classes=2,
    )
    assert slid2.shape == (1, HW, HW, 2)
    assert np.isfinite(np.asarray(slid2)).all()


@pytest.mark.slow
def test_dataset_test_loop_with_tta(tmp_path):
    cv2 = pytest.importorskip("cv2")
    from PIL import Image
    from cp2_tpu.data.custom import CustomDataset
    from cp2_tpu.train.test_loop import dataset_test

    img_dir = tmp_path / "img"
    ann_dir = tmp_path / "ann"
    img_dir.mkdir()
    ann_dir.mkdir()
    r = np.random.RandomState(0)
    for i in range(2):
        Image.fromarray((r.rand(40, 40, 3) * 255).astype(np.uint8)).save(
            img_dir / f"s{i}.png"
        )
        Image.fromarray((r.rand(40, 40) > 0.5).astype(np.uint8)).save(
            ann_dir / f"s{i}.png"
        )

    pipeline = [
        dict(type="LoadImageFromFile"),
        dict(
            type="MultiScaleFlipAug",
            img_scale=(32, 32),
            flip=True,
            transforms=[
                dict(type="Resize", keep_ratio=False),
                dict(type="RandomFlip", prob=0.0),
                dict(type="Normalize", mean=[0, 0, 0], std=[255, 255, 255]),
                dict(type="ImageToTensor", keys=["img"]),
                dict(type="Collect", keys=["img"]),
            ],
        ),
    ]
    ds = CustomDataset(
        pipeline, img_dir=str(img_dir), img_suffix=".png",
        ann_dir=str(ann_dir), seg_map_suffix=".png", classes=("bg", "fg"),
    )
    model = build_segmentor(TINY_SEG)
    x0 = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)
    preds = dataset_test(model, variables, ds)
    assert len(preds) == 2
    assert preds[0].shape == (32, 32)
    assert set(np.unique(preds[0])) <= {0, 1}
