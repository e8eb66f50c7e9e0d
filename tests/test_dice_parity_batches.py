"""Contract tests for tools/dice_parity.make_corpus_batches.

The head-to-head Dice-parity instrument (tools/dice_parity.py) feeds the
SAME precomputed numpy batches to the reference's torch ``forward_cp2``
and to our jitted step; its evidential value rests on those batches
honouring the CP2 input contract (reference loader.py:50-118 +
main.py:206-228):

- pixel ids are the exact source-grid ids of each crop, so id equality
  between view a and view b marks exactly the geometric overlap;
- region ids ride the same geometry;
- an hflip of view b carries image AND id maps together;
- background streams contain exactly one zeroed rectangle per image and
  are strictly positive elsewhere (the composite mask is ``bg[...,0]==0``,
  builder.py:1146-1152);
- identical seed -> identical batches (both frameworks must consume the
  same arrays).
"""

import numpy as np
import pytest

from tools.dice_parity import make_corpus_batches


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """A tiny deterministic image corpus on disk (PNG, like the real one)."""
    from PIL import Image

    root = tmp_path_factory.mktemp("dp_corpus")
    rng = np.random.RandomState(0)
    files = []
    for i in range(3):
        arr = rng.randint(30, 226, size=(48, 48, 3)).astype(np.uint8)
        p = root / f"train_{i}.png"
        Image.fromarray(arr).save(p)
        files.append(str(p))
    return files


@pytest.fixture(scope="module")
def batches(corpus):
    return make_corpus_batches(corpus, n_steps=4, batch=3, hw=32, seed=7)


def test_shapes_and_dtypes(batches):
    assert len(batches) == 4
    b = batches[0]
    assert b["img_a"].shape == (3, 32, 32, 3)
    assert b["img_a"].dtype == np.float32
    assert b["pixel_ids_a"].shape == (3, 32, 32)
    assert b["pixel_ids_a"].dtype == np.int64
    assert set(b) == {"img_a", "img_b", "bg0", "bg1", "pixel_ids_a",
                      "pixel_ids_b", "region_ids_a", "region_ids_b"}


def test_pixel_ids_are_exact_crop_geometry(batches):
    """Ids are contiguous source-grid windows: consecutive within a row,
    row stride = source width, and the a/b id sets overlap (crops of the
    same image are taken within hw//3 of each other)."""
    for b in batches:
        for j in range(b["img_a"].shape[0]):
            for ids in (b["pixel_ids_a"][j],):
                assert (np.diff(ids, axis=1) == 1).all()
                stride = ids[1, 0] - ids[0, 0]
                assert stride >= ids.shape[1]  # source width >= crop width
                assert (np.diff(ids, axis=0) == stride).all()
            shared = np.intersect1d(b["pixel_ids_a"][j], b["pixel_ids_b"][j])
            assert shared.size > 0, "views must geometrically overlap"


def test_id_overlap_marks_identical_source_pixels(corpus):
    """Where pixel ids match across views, the un-jittered source pixels
    are the same pixel — checked by reconstructing source coordinates
    from the id value (ids are 1 + y*W + x of the source grid)."""
    batches = make_corpus_batches(corpus, n_steps=2, batch=2, hw=16, seed=3)
    for b in batches:
        for j in range(2):
            ia, ib = b["pixel_ids_a"][j], b["pixel_ids_b"][j]
            shared = np.intersect1d(ia, ib)
            # coordinates recovered from ids must agree between views
            for sid in shared[:: max(1, shared.size // 8)]:
                ya, xa = np.argwhere(ia == sid)[0]
                yb, xb = np.argwhere(ib == sid)[0]
                # same id -> same region id too (regions are id-derived)
                assert b["region_ids_a"][j, ya, xa] == \
                    b["region_ids_b"][j, yb, xb]


def test_hflip_carries_ids_with_image(batches):
    """If view b was flipped, its id rows must DECREASE by 1 left-to-right;
    either orientation must appear across a few batches."""
    orientations = set()
    for b in batches:
        for j in range(b["img_b"].shape[0]):
            d = np.diff(b["pixel_ids_b"][j], axis=1)
            assert (d == 1).all() or (d == -1).all()
            orientations.add(int(d[0, 0]))
    assert orientations == {1, -1}, "p=0.5 hflip should produce both"


def test_background_erase_contract(batches):
    """Exactly one zeroed rectangle; all other pixels strictly positive;
    the channel-0 zero mask equals the all-channel zero mask."""
    for b in batches:
        for key in ("bg0", "bg1"):
            bg = b[key]
            for j in range(bg.shape[0]):
                m0 = bg[j, :, :, 0] == 0
                assert m0.any(), "an erased rectangle must exist"
                assert (bg[j][m0] == 0).all()
                assert (bg[j][~m0] > 0).all()
                ys, xs = np.where(m0)
                assert m0.sum() == (ys.max() - ys.min() + 1) * \
                    (xs.max() - xs.min() + 1), "erase must be a solid rect"


def test_seed_determinism(corpus):
    a = make_corpus_batches(corpus, n_steps=2, batch=2, hw=16, seed=11)
    b = make_corpus_batches(corpus, n_steps=2, batch=2, hw=16, seed=11)
    c = make_corpus_batches(corpus, n_steps=2, batch=2, hw=16, seed=12)
    for ba, bb in zip(a, b):
        for k in ba:
            np.testing.assert_array_equal(ba[k], bb[k])
    assert any(not np.array_equal(a[0][k], c[0][k]) for k in a[0])
