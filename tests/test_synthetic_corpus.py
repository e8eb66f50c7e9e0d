"""Contract tests for the quality-gate synthetic corpus.

The gate (tools/quality_gate.py) pretrains on ``images/`` PLUS an
``unlabeled/`` pool and finetunes on ``images/``+``masks/`` only — the
same regime as the reference, which pretrains on the full unlabeled
image pools (datasets/pretrain_dataset.py) while the finetune split
subsamples the labeled set (datasets/finetune_dataset.py:150-207).
These tests pin the discovery rules that keep the two sets disjoint.
"""

import hashlib
import os
import shutil
import tempfile
from glob import glob

import pytest

from cp2_tpu.data.datasets import (
    DatasetType,
    DataSplitType,
    get_data_splits,
    get_pretrain_files,
    list_image_mask_pairs,
)
from tools.make_synthetic_dataset import generate, generate_unlabeled


@pytest.fixture(scope="module")
def corpus():
    # NOT a pytest tmp dir: FILENAME split matching is substring-on-path
    # (reference datasets/pretrain_dataset.py semantics), and "pytest-*"
    # path components contain "test"
    root = tempfile.mkdtemp(prefix="syncorpus_", dir="/tmp")
    generate(root, 32, {"train": 6, "val": 2, "test": 2}, seed=7)
    generate_unlabeled(root, 32, 5, seed=7)
    yield root
    shutil.rmtree(root, ignore_errors=True)


def test_pretrain_sees_labeled_and_pool(corpus):
    img_dir = os.path.join(corpus, "images")
    un_dir = os.path.join(corpus, "unlabeled")
    files = get_pretrain_files([img_dir, un_dir], DatasetType.FILENAME,
                               "train")
    assert len(files) == 6 + 5
    # and the pool never leaks into val/test discovery
    for split in ("val", "test"):
        split_files = get_pretrain_files([img_dir, un_dir],
                                         DatasetType.FILENAME, split)
        assert len(split_files) == 2
        assert all("unlabeled" + os.sep not in p for p in split_files)


def test_finetune_splits_never_see_pool(corpus):
    pairs = list_image_mask_pairs(os.path.join(corpus, "images"),
                                  os.path.join(corpus, "masks"))
    assert len(pairs) == 10
    splits = get_data_splits(pairs, DataSplitType.FILENAME, 1.0)
    assert {k: len(v) for k, v in splits.items()} == {
        "train": 6, "val": 2, "test": 2}
    assert all("unlabeled" + os.sep not in img
               for split in splits.values() for img, _ in split)


def test_pool_images_have_no_masks(corpus):
    stems = {os.path.basename(p)
             for p in glob(os.path.join(corpus, "unlabeled", "*"))}
    assert len(stems) == 5
    mask_stems = {os.path.basename(p)
                  for p in glob(os.path.join(corpus, "masks", "*"))}
    assert not stems & mask_stems


def test_pool_generation_deterministic(corpus, tmp_path):
    generate_unlabeled(str(tmp_path), 32, 5, seed=7)
    for name in sorted(os.listdir(os.path.join(corpus, "unlabeled"))):
        a = open(os.path.join(corpus, "unlabeled", name), "rb").read()
        b = open(os.path.join(str(tmp_path), "unlabeled", name), "rb").read()
        assert hashlib.md5(a).digest() == hashlib.md5(b).digest(), name
    # pool indices are seed-offset from the labeled splits: disjoint content
    first_pool = open(os.path.join(corpus, "unlabeled",
                                   "train_u00000.png"), "rb").read()
    first_train = open(os.path.join(corpus, "images",
                                    "train_0000.png"), "rb").read()
    assert first_pool != first_train


def test_hard_corpus_versions_deterministic_and_distinct():
    """v2/v3 (hard corpora, VERDICT r4 next #2): deterministic per seed,
    distinct from v1 and from each other, masks stay binary uint8."""
    import numpy as np

    from tools.make_synthetic_dataset import (
        make_sample,
        make_sample_v2,
        make_sample_v3,
        make_sample_v4,
    )

    for fn in (make_sample_v2, make_sample_v3, make_sample_v4):
        img, mask = fn(11, 64)
        img2, mask2 = fn(11, 64)
        assert (img == img2).all() and (mask == mask2).all()
        assert img.dtype == np.uint8 and img.shape == (64, 64, 3)
        assert set(np.unique(mask)) <= {0, 255}
        # targets exist but don't dominate
        frac = (mask > 0).mean()
        assert 0.005 < frac < 0.6, frac

    v1 = make_sample(11, 64)[0]
    v2 = make_sample_v2(11, 64)[0]
    v3 = make_sample_v3(11, 64)[0]
    v4 = make_sample_v4(11, 64)[0]
    assert not (v1 == v2).all()
    assert not (v2 == v3).all()
    # v4 (the calibrated in-band interpolation the r5 gate runs on) is
    # its own draw, distinct from both endpoints
    assert not (v4 == v2).all() and not (v4 == v3).all()


def test_generate_version_plumbs_through(tmp_path):
    import numpy as np
    from PIL import Image

    from tools.make_synthetic_dataset import generate, make_sample_v2

    generate(str(tmp_path), 32, {"train": 1}, seed=3, version=2)
    got = np.asarray(Image.open(tmp_path / "images" / "train_0000.png"))
    want, _ = make_sample_v2(3, 32)
    assert (got == want).all()
