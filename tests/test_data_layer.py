"""Data layer: splits, loaders (python + native), mmseg pipeline."""

import os

import numpy as np
import pytest

from cp2_tpu.data.datasets import (
    get_data_splits,
    get_pretrain_files,
    list_image_mask_pairs,
    pseudo_test_subset,
)
from cp2_tpu.types import DatasetType, DataSplitType


@pytest.fixture(scope="module")
def seg_tree(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("segdata")
    img_dir = root / "images"
    mask_dir = root / "masks"
    img_dir.mkdir()
    mask_dir.mkdir()
    r = np.random.RandomState(0)
    for split, count in (("train", 8), ("val", 3), ("test", 5)):
        for i in range(count):
            name = f"{split}{i:02d}_{split}.png"
            Image.fromarray((r.rand(40, 50, 3) * 255).astype(np.uint8)).save(
                img_dir / name
            )
            Image.fromarray((r.rand(40, 50) > 0.5).astype(np.uint8) * 255).save(
                mask_dir / name
            )
    return str(img_dir), str(mask_dir)


def test_filename_splits_partition(seg_tree):
    img_dir, mask_dir = seg_tree
    pairs = list_image_mask_pairs(img_dir, mask_dir)
    splits = get_data_splits(pairs, DataSplitType.FILENAME, 1.0)
    assert len(splits["train"]) == 8
    assert len(splits["val"]) == 3
    assert len(splits["test"]) == 5


def test_random_splits_deterministic(seg_tree):
    img_dir, mask_dir = seg_tree
    pairs = list_image_mask_pairs(img_dir, mask_dir)
    a = get_data_splits(pairs, DataSplitType.RANDOM, 1.0)
    b = get_data_splits(pairs, DataSplitType.RANDOM, 1.0)
    assert a["train"] == b["train"] and a["test"] == b["test"]
    # ratio subsampling shrinks train deterministically
    c = get_data_splits(pairs, DataSplitType.RANDOM, 0.5)
    assert len(c["train"]) == len(a["train"]) // 2
    assert set(c["train"]) <= set(a["train"])


def test_pseudo_test_subset_divisible(seg_tree):
    img_dir, mask_dir = seg_tree
    pairs = list_image_mask_pairs(img_dir, mask_dir)
    subset = pseudo_test_subset(pairs, batch_size=2, num_devices=2)
    assert len(subset) % 4 == 0
    assert set(subset) <= set(pairs)


def test_host_loader_shards_and_reshuffles(seg_tree):
    from cp2_tpu.data import HostDataLoader, SegmentationDataSource

    img_dir, mask_dir = seg_tree
    pairs = list_image_mask_pairs(img_dir, mask_dir)
    src = SegmentationDataSource(pairs, image_size=32, num_classes=2)
    loader = HostDataLoader(src, batch_size=4, seed=0)
    batches0 = list(loader.epoch_iterator(0))
    batches1 = list(loader.epoch_iterator(1))
    assert len(batches0) == len(loader) == 4
    assert batches0[0]["image"].shape == (4, 32, 32, 3)
    assert batches0[0]["mask"].dtype == np.int32
    assert set(np.unique(batches0[0]["mask"])) <= {0, 1}
    # different epoch -> different order (almost surely)
    assert not np.array_equal(batches0[0]["image"], batches1[0]["image"])

    # sharding partitions indices
    l0 = HostDataLoader(src, batch_size=2, seed=0, shard=(0, 2))
    l1 = HostDataLoader(src, batch_size=2, seed=0, shard=(1, 2))
    i0 = l0._epoch_indices(0)
    i1 = l1._epoch_indices(0)
    assert set(i0).isdisjoint(set(i1))


def test_native_loader_matches_python_decode(seg_tree):
    native = pytest.importorskip("cp2_tpu.native")
    if not native.native_available():
        pytest.skip(f"native loader unavailable: {native.build_error()}")
    img_dir, _ = seg_tree
    files = sorted(
        os.path.join(img_dir, f) for f in os.listdir(img_dir)
    )
    ld = native.NativePretrainLoader(
        files, batch_size=4, base_hw=(48, 48), threads=2, shuffle=False
    )
    batch = next(ld.epoch_iterator(0))
    img = batch["image"]
    assert img.shape == (4, 48, 48, 3)
    # compare against PIL decode+resize of the first file (tolerant: both
    # bilinear half-pixel, small rounding differences allowed)
    from PIL import Image

    ref = Image.open(files[0]).convert("RGB").resize((48, 48), Image.BILINEAR)
    diff = np.abs(img[0].astype(int) - np.asarray(ref, int))
    assert diff.mean() < 3.0


def test_native_loader_batch_order_deterministic(seg_tree):
    """Batches must arrive in index order regardless of worker scheduling
    (regression: completion-order FIFO delivered batches out of order
    under CPU contention)."""
    native = pytest.importorskip("cp2_tpu.native")
    if not native.native_available():
        pytest.skip(f"native loader unavailable: {native.build_error()}")
    img_dir, _ = seg_tree
    files = sorted(os.path.join(img_dir, f) for f in os.listdir(img_dir))
    ld = native.NativePretrainLoader(
        files, batch_size=2, base_hw=(16, 16), threads=8, shuffle=False
    )
    ref = None
    for trial in range(5):
        frames = np.concatenate(
            [b["image"] for b in ld.epoch_iterator(0)], axis=0
        )
        if ref is None:
            ref = frames
        else:
            assert np.array_equal(frames, ref)


def test_native_pair_loader_matches_python_source(seg_tree):
    native = pytest.importorskip("cp2_tpu.native")
    if not native.native_available():
        pytest.skip(f"native loader unavailable: {native.build_error()}")
    from cp2_tpu.data import SegmentationDataSource

    img_dir, mask_dir = seg_tree
    pairs = list_image_mask_pairs(img_dir, mask_dir)
    src = SegmentationDataSource(pairs, 32, num_classes=2, random_crop=False)
    ld = native.NativePairLoader(
        pairs, batch_size=4, base_hw=(32, 32), mode="crop",
        random_crop=False, num_classes=2, threads=3, shuffle=False,
    )
    batch = next(ld.epoch_iterator(0))
    for i in range(4):
        ref = src.load(i)
        # same geometry; antialiased resample matches PIL within rounding
        di = np.abs(batch["image"][i].astype(int) - ref["image"].astype(int))
        assert di.mean() < 1.0 and di.max() <= 2
        # mask path (PIL-law nearest + shared crop) is bit-exact
        assert np.array_equal(batch["mask"][i], ref["mask"])


def test_native_pair_loader_region_mode_exact(seg_tree):
    native = pytest.importorskip("cp2_tpu.native")
    if not native.native_available():
        pytest.skip(f"native loader unavailable: {native.build_error()}")
    from cp2_tpu.data.host_loader import _decode_mask

    img_dir, mask_dir = seg_tree
    pairs = list_image_mask_pairs(img_dir, mask_dir)
    ld = native.NativePairLoader(
        pairs, batch_size=4, base_hw=(48, 48), mode="region",
        threads=2, shuffle=False,
    )
    batch = next(ld.epoch_iterator(0))
    ref = _decode_mask(pairs[0][1], (48, 48))
    assert np.array_equal(batch["mask"][0], ref)


def test_native_pair_loader_crop_rng(seg_tree):
    """Random crops: deterministic per epoch, different across epochs."""
    native = pytest.importorskip("cp2_tpu.native")
    if not native.native_available():
        pytest.skip(f"native loader unavailable: {native.build_error()}")
    img_dir, mask_dir = seg_tree
    pairs = list_image_mask_pairs(img_dir, mask_dir)
    ld = native.NativePairLoader(
        pairs, batch_size=4, base_hw=(24, 24), mode="crop",
        random_crop=True, threads=4, shuffle=False,
    )
    e0a = next(ld.epoch_iterator(0))["image"].copy()
    e1 = next(ld.epoch_iterator(1))["image"].copy()
    e0b = next(ld.epoch_iterator(0))["image"].copy()
    assert np.array_equal(e0a, e0b)
    assert not np.array_equal(e0a, e1)


def test_loaders_pad_final_batch_and_report_valid(seg_tree):
    """drop_last=False loaders pad the short final batch to a static shape
    (repeating the last row) and report the true row count in "valid" —
    eval must be able to mask the pad back out (round-2 advisor finding:
    padded duplicates biased val/test IoU)."""
    from cp2_tpu.data import HostDataLoader, SegmentationDataSource

    img_dir, mask_dir = seg_tree
    pairs = list_image_mask_pairs(img_dir, mask_dir)[:5]
    src = SegmentationDataSource(pairs, 32, num_classes=2, random_crop=False)
    hl = HostDataLoader(
        src, batch_size=4, shuffle=False, drop_last=False, num_workers=2
    )
    batches = list(hl.epoch_iterator(0))
    assert [int(b["valid"].sum()) for b in batches] == [4, 1]
    last = batches[-1]
    assert last["image"].shape == (4, 32, 32, 3)
    for j in range(1, 4):  # pad rows repeat the final sample
        assert np.array_equal(last["image"][j], last["image"][0])

    native = pytest.importorskip("cp2_tpu.native")
    if not native.native_available():
        pytest.skip(f"native loader unavailable: {native.build_error()}")
    nl = native.NativePairLoader(
        pairs, batch_size=4, base_hw=(32, 32), mode="crop",
        random_crop=False, num_classes=2, threads=2, shuffle=False,
        drop_last=False,
    )
    nbatches = list(nl.epoch_iterator(0))
    assert [int(b["valid"].sum()) for b in nbatches] == [4, 1]
    for j in range(1, 4):
        assert np.array_equal(nbatches[-1]["image"][j], nbatches[-1]["image"][0])


def test_native_loader_shards_lockstep(seg_tree):
    """Host sharding: disjoint sample sets, identical batch counts per
    shard (hosts must stay in lockstep), matching the Python loader law
    (truncate to a multiple of num_shards, then stride)."""
    native = pytest.importorskip("cp2_tpu.native")
    if not native.native_available():
        pytest.skip(f"native loader unavailable: {native.build_error()}")
    img_dir, mask_dir = seg_tree
    pairs = list_image_mask_pairs(img_dir, mask_dir)  # 16 pairs
    shards = []
    for sid in range(2):
        ld = native.NativePairLoader(
            pairs, batch_size=4, base_hw=(24, 24), mode="crop",
            random_crop=False, num_classes=2, threads=2, shuffle=True,
            seed=7, shard=(sid, 2),
        )
        assert len(ld) == 2  # 16 / 2 shards / batch 4
        frames = np.concatenate(
            [b["image"] for b in ld.epoch_iterator(0)], axis=0
        )
        shards.append(frames)
    # disjoint: no row of shard 0 appears in shard 1
    flat0 = {s.tobytes() for s in shards[0]}
    flat1 = {s.tobytes() for s in shards[1]}
    assert flat0.isdisjoint(flat1)
    assert len(flat0 | flat1) == 16

    # python loader sees the same per-shard count law on odd sizes
    from cp2_tpu.data import HostDataLoader, SegmentationDataSource

    src5 = SegmentationDataSource(pairs[:5], 24, 2, random_crop=False)
    l0 = HostDataLoader(src5, 2, shuffle=False, drop_last=True, shard=(0, 2))
    l1 = HostDataLoader(src5, 2, shuffle=False, drop_last=True, shard=(1, 2))
    assert len(list(l0.epoch_iterator(0))) == len(list(l1.epoch_iterator(0))) == 1


def test_host_loader_num_workers_reproducible(seg_tree):
    """Multi-worker decode must not change batch content (per-item RNG is
    derived from (seed, epoch, index), not from thread schedule)."""
    from cp2_tpu.data import HostDataLoader, SegmentationDataSource

    img_dir, mask_dir = seg_tree
    pairs = list_image_mask_pairs(img_dir, mask_dir)
    src = SegmentationDataSource(pairs, 32, num_classes=2, random_crop=True)
    batches = {}
    for workers in (1, 4):
        ld = HostDataLoader(
            src, batch_size=4, seed=3, num_workers=workers
        )
        batches[workers] = list(ld.epoch_iterator(2))
    for b1, b4 in zip(batches[1], batches[4]):
        assert np.array_equal(b1["image"], b4["image"])
        assert np.array_equal(b1["mask"], b4["mask"])


def test_mmseg_pipeline_end_to_end(seg_tree, tmp_path):
    cv2 = pytest.importorskip("cv2")
    from cp2_tpu.data.custom import CustomDataset

    img_dir, mask_dir = seg_tree
    # class-index masks (values {0,1}; 255 would be ignore_index in mmseg)
    from PIL import Image as PILImage

    ann_dir = tmp_path / "ann"
    ann_dir.mkdir()
    for name in os.listdir(mask_dir):
        m = np.asarray(PILImage.open(os.path.join(mask_dir, name)))
        PILImage.fromarray((m > 0).astype(np.uint8)).save(ann_dir / name)
    mask_dir = str(ann_dir)
    pipeline = [
        dict(type="LoadImageFromFile"),
        dict(type="LoadAnnotations"),
        dict(type="Resize", img_scale=(64, 48), ratio_range=(0.9, 1.1)),
        dict(type="RandomFlip", prob=0.5),
        dict(type="PhotoMetricDistortion"),
        dict(type="Normalize", mean=[123.675, 116.28, 103.53],
             std=[58.395, 57.12, 57.375]),
        dict(type="Pad", size=(64, 64)),
        dict(type="DefaultFormatBundle"),
        dict(type="Collect", keys=["img", "gt_semantic_seg"]),
    ]
    ds = CustomDataset(
        pipeline, img_dir=img_dir, img_suffix=".png",
        ann_dir=mask_dir, seg_map_suffix=".png",
        classes=("bg", "fg"),
    )
    assert len(ds) == 16
    sample = ds[0]
    assert sample["img"].shape == (64, 64, 3)
    assert sample["gt_semantic_seg"].shape == (64, 64)
    assert sample["img_metas"]["filename"].endswith(".png")

    # evaluate on perfect predictions -> mIoU 1 over present classes
    gts = [np.asarray((g > 0).astype(np.int64)) for g in ds.get_gt_seg_maps()]
    out = ds.evaluate(gts, metric=["mIoU", "mDice"])
    assert out["mIoU"] == pytest.approx(1.0)
    assert out["mDice"] == pytest.approx(1.0)


def test_seg_source_resize_mode_nonsquare(seg_tree):
    """Lemon geometry: direct aspect-breaking resize, no crop (reference
    A.Resize(544,1024,INTER_NEAREST), finetune_dataset.py:349-384), and
    the native region-mode loader delivers the same mask geometry."""
    from cp2_tpu.data import SegmentationDataSource

    img_dir, mask_dir = seg_tree
    pairs = list_image_mask_pairs(img_dir, mask_dir)
    src = SegmentationDataSource(
        pairs, (24, 56), num_classes=12, mode="resize"
    )
    row = src.load(0)
    assert row["image"].shape == (24, 56, 3)
    assert row["mask"].shape == (24, 56)

    with pytest.raises(ValueError):
        SegmentationDataSource(pairs, (24, 56), mode="crop")

    native = pytest.importorskip("cp2_tpu.native")
    if not native.native_available():
        pytest.skip(f"native loader unavailable: {native.build_error()}")
    ld = native.NativePairLoader(
        pairs, batch_size=2, base_hw=(24, 56), mode="region",
        num_classes=12, threads=2, shuffle=False,
    )
    batch = next(ld.epoch_iterator(0))
    assert batch["image"].shape == (2, 24, 56, 3)
    # PIL-law nearest on the mask: native == python bit-exact
    from cp2_tpu.data.host_loader import _decode_mask

    ref = _decode_mask(pairs[0][1], (24, 56))
    # seg_tree masks are 0/255; resize-mode multi-class keeps raw ids
    assert np.array_equal(batch["mask"][0], ref)


# ---------------------------------------------------------------------------
# raw-frame cache: decode+resample once, mmap thereafter — must be
# bit-identical to live decode in every mode, and invalidate on source edits
# ---------------------------------------------------------------------------


def _epoch_frames(ld, epochs=(0, 1)):
    out = []
    for e in epochs:
        for b in ld.epoch_iterator(e):
            out.append({k: np.asarray(v).copy() for k, v in b.items()})
    return out


def _assert_batches_equal(a, b):
    assert len(a) == len(b)
    for x, y in zip(a, b):
        assert sorted(x) == sorted(y)
        for k in x:
            np.testing.assert_array_equal(x[k], y[k], err_msg=k)


def test_native_cache_bit_exact_pretrain(seg_tree, tmp_path):
    native = pytest.importorskip("cp2_tpu.native")
    if not native.native_available():
        pytest.skip(f"native loader unavailable: {native.build_error()}")
    img_dir, _ = seg_tree
    files = sorted(os.path.join(img_dir, f) for f in os.listdir(img_dir))
    kw = dict(batch_size=3, base_hw=(32, 32), threads=2, seed=7,
              shuffle=True, drop_last=False)
    live = native.NativePretrainLoader(files, **kw)
    cache = str(tmp_path / "pre.rawc")
    cached = native.NativePretrainLoader(files, cache_path=cache, **kw)
    assert cached.cache_status == 1  # built now
    _assert_batches_equal(_epoch_frames(live), _epoch_frames(cached))
    # second attach maps the existing file
    again = native.NativePretrainLoader(files, cache_path=cache, **kw)
    assert again.cache_status == 2
    _assert_batches_equal(_epoch_frames(live), _epoch_frames(again))


@pytest.mark.parametrize("mode,hw", [("region", (24, 56)), ("crop", (24, 24))])
def test_native_cache_bit_exact_pairs(seg_tree, tmp_path, mode, hw):
    """Pair modes: region caches the final base pair; crop caches the
    SmallestMaxSize intermediate and applies the per-epoch random crop at
    read time — epochs 0 and 1 must both match live decode exactly."""
    native = pytest.importorskip("cp2_tpu.native")
    if not native.native_available():
        pytest.skip(f"native loader unavailable: {native.build_error()}")
    img_dir, mask_dir = seg_tree
    pairs = list_image_mask_pairs(img_dir, mask_dir)
    kw = dict(batch_size=3, base_hw=hw, mode=mode, num_classes=2,
              threads=2, seed=5, shuffle=True, drop_last=False)
    live = native.NativePairLoader(pairs, **kw)
    cache = str(tmp_path / f"{mode}.rawc")
    cached = native.NativePairLoader(pairs, cache_path=cache, **kw)
    assert cached.cache_status == 1
    _assert_batches_equal(_epoch_frames(live), _epoch_frames(cached))


def test_native_cache_invalidates_on_source_change(seg_tree, tmp_path):
    native = pytest.importorskip("cp2_tpu.native")
    if not native.native_available():
        pytest.skip(f"native loader unavailable: {native.build_error()}")
    from PIL import Image

    img_dir, _ = seg_tree
    files = sorted(os.path.join(img_dir, f) for f in os.listdir(img_dir))
    # copy sources so we can mutate one without disturbing other tests
    work = tmp_path / "src"
    work.mkdir()
    local = []
    for f in files[:4]:
        dst = work / os.path.basename(f)
        dst.write_bytes(open(f, "rb").read())
        local.append(str(dst))
    kw = dict(batch_size=2, base_hw=(16, 16), threads=2, shuffle=False)
    cache = str(tmp_path / "inv.rawc")
    first = native.NativePretrainLoader(local, cache_path=cache, **kw)
    assert first.cache_status == 1
    del first
    # mutate one source (new content + bumped mtime: st_mtime has 1s
    # granularity, so set it explicitly)
    Image.fromarray(
        np.full((20, 20, 3), 200, np.uint8)
    ).save(local[0])
    st = os.stat(local[0])
    os.utime(local[0], (st.st_atime, st.st_mtime + 10))
    rebuilt = native.NativePretrainLoader(local, cache_path=cache, **kw)
    assert rebuilt.cache_status == 1  # key mismatch -> rebuilt
    frame = next(rebuilt.epoch_iterator(0))["image"][0]
    assert abs(int(frame.mean()) - 200) <= 2


def test_default_cache_path_distinguishes(seg_tree, tmp_path):
    native = pytest.importorskip("cp2_tpu.native")
    img_dir, _ = seg_tree
    files = sorted(os.path.join(img_dir, f) for f in os.listdir(img_dir))
    a = native.default_cache_path(str(tmp_path), files, (32, 32), "none")
    b = native.default_cache_path(str(tmp_path), files, (48, 48), "none")
    c = native.default_cache_path(str(tmp_path), files[:-1], (32, 32), "none")
    assert len({a, b, c}) == 3 and a.startswith(str(tmp_path))


def test_native_cache_rejects_corrupt_record(seg_tree, tmp_path):
    """A record whose blob offset points outside the mapping must be
    rejected at load (not segfault a worker) — the attach then rebuilds
    the file and batches stay bit-exact."""
    import struct

    native = pytest.importorskip("cp2_tpu.native")
    if not native.native_available():
        pytest.skip(f"native loader unavailable: {native.build_error()}")
    img_dir, _ = seg_tree
    files = sorted(os.path.join(img_dir, f) for f in os.listdir(img_dir))
    kw = dict(batch_size=2, base_hw=(32, 32), threads=2, seed=1,
              shuffle=True, drop_last=False)
    live = native.NativePretrainLoader(files, **kw)
    cache = str(tmp_path / "corrupt.rawc")
    built = native.NativePretrainLoader(files, cache_path=cache, **kw)
    assert built.cache_status == 1
    # CacheHeader: magic[8] mode:u32 n,h,w:i32 key:u64 index_off:u64
    with open(cache, "r+b") as f:
        f.seek(32)
        (index_off,) = struct.unpack("<Q", f.read(8))
        f.seek(index_off)  # rec 0: img_off:u64 aux_off:u64 h,w:i32
        f.write(struct.pack("<Q", 1 << 60))
    rebuilt = native.NativePretrainLoader(files, cache_path=cache, **kw)
    assert rebuilt.cache_status == 1  # rejected + rebuilt, not mapped as-is
    _assert_batches_equal(_epoch_frames(live), _epoch_frames(rebuilt))


def test_native_cache_with_sharding(seg_tree, tmp_path):
    """Cache reads are indexed by FILE index, so a sharded loader must see
    the same per-shard batches cached as live (any file can land on any
    shard in later epochs — the cache always covers the full list)."""
    native = pytest.importorskip("cp2_tpu.native")
    if not native.native_available():
        pytest.skip(f"native loader unavailable: {native.build_error()}")
    img_dir, _ = seg_tree
    files = sorted(os.path.join(img_dir, f) for f in os.listdir(img_dir))
    cache = str(tmp_path / "shard.rawc")
    for shard in ((0, 2), (1, 2)):
        kw = dict(batch_size=2, base_hw=(16, 16), threads=2, seed=3,
                  shuffle=True, drop_last=True, shard=shard)
        live = native.NativePretrainLoader(files, **kw)
        cached = native.NativePretrainLoader(files, cache_path=cache, **kw)
        assert cached.cache_status in (1, 2)
        _assert_batches_equal(_epoch_frames(live), _epoch_frames(cached))
