"""CutPaste synthesis: mask/class consistency, mirror pasting."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cp2_tpu.augment.cutpaste import CutPasteConfig, cutpaste_batch


def _images(n=4, hw=32, seed=0):
    r = np.random.RandomState(seed)
    return jnp.asarray(r.rand(n, hw, hw, 3).astype(np.float32))


def test_cutpaste_mask_matches_class():
    cfg = CutPasteConfig(num_classes=3, max_num_patches=1)
    out = jax.jit(lambda r, x: cutpaste_batch(r, x, None, cfg))(
        jax.random.PRNGKey(0), _images(8)
    )
    masks = np.asarray(out["mask"])
    classes = np.asarray(out["target"])
    for i in range(len(classes)):
        uniq = set(np.unique(masks[i]).tolist())
        if classes[i] == 0:
            assert uniq == {0}
        else:
            assert uniq <= {0, int(classes[i])}
            assert int(classes[i]) in uniq  # patch exists


def test_cutpaste_mirror_shares_patch_pixels():
    cfg = CutPasteConfig(num_classes=2, max_num_patches=1)
    imgs = _images(6, seed=1)
    mirrors = _images(6, seed=2)
    out = jax.jit(lambda r, a, b: cutpaste_batch(r, a, b, cfg))(
        jax.random.PRNGKey(3), imgs, mirrors
    )
    img = np.asarray(out["image"])
    mir = np.asarray(out["mirror"])
    mask = np.asarray(out["mask"]) > 0
    cls = np.asarray(out["target"])
    for i in range(len(cls)):
        if cls[i] > 0 and mask[i].any():
            # pasted pixels are identical between image and mirror
            np.testing.assert_allclose(img[i][mask[i]], mir[i][mask[i]])
            # off-patch pixels of the mirror come from the mirror base image
            off = ~mask[i]
            np.testing.assert_allclose(
                mir[i][off], np.asarray(mirrors)[i][off]
            )


@pytest.mark.slow
def test_regular_patch_geometry_matches_reference_law():
    """Distributional fidelity vs the reference sampler
    (pretrain_dataset.py:290-318): REGULAR patch area fraction is
    area_scale ~ U(min,max) and aspect ~ U(1/3, 4/3); the device op must
    reproduce the same area-fraction and bounding-box-aspect laws."""
    hw = 64
    cfg = CutPasteConfig(num_classes=2, max_num_patches=1)
    fracs, aspects = [], []
    run = jax.jit(lambda r, x: cutpaste_batch(r, x, None, cfg))
    imgs = _images(32, hw=hw)
    for seed in range(8):
        out = run(jax.random.PRNGKey(seed), imgs)
        masks = np.asarray(out["mask"])
        classes = np.asarray(out["target"])
        for i in range(len(classes)):
            if classes[i] == 0:
                continue
            m = masks[i] > 0
            if not m.any():
                continue
            fracs.append(m.mean())
            ys, xs = np.nonzero(m)
            bh = ys.max() - ys.min() + 1
            bw = xs.max() - xs.min() + 1
            aspects.append(bw / bh)
    fracs, aspects = np.asarray(fracs), np.asarray(aspects)
    assert len(fracs) > 100

    # reference law, transliterated (numpy): patch = int(sqrt(A/ar)) x
    # int(h*ar) at integer positions -> same area-fraction distribution
    r = np.random.RandomState(0)
    ref_fracs = []
    for _ in range(1000):
        scale = r.uniform(cfg.min_area_scale, cfg.max_area_scale)
        ar = r.uniform(cfg.min_aspect_ratio, cfg.max_aspect_ratio)
        area = int(hw * hw * scale)
        ph = int(np.sqrt(area / ar))
        pw = int(ph * ar)
        ref_fracs.append(ph * pw / (hw * hw))
    ref_fracs = np.asarray(ref_fracs)

    assert abs(fracs.mean() - ref_fracs.mean()) < 0.02, (
        fracs.mean(), ref_fracs.mean())
    assert abs(np.median(fracs) - np.median(ref_fracs)) < 0.02
    # aspect bounds (integer truncation gives a little slack)
    assert aspects.min() >= cfg.min_aspect_ratio * 0.7
    assert aspects.max() <= cfg.max_aspect_ratio * 1.3


def test_scar_patches_are_thin_and_rotated():
    cfg = CutPasteConfig(
        num_classes=3, max_num_patches=1, min_rotation=30, max_rotation=60
    )
    # force scar class by sampling until one appears
    for seed in range(10):
        out = cutpaste_batch(jax.random.PRNGKey(seed), _images(4, hw=48), None, cfg)
        classes = np.asarray(out["target"])
        if (classes == 2).any():
            i = int(np.argmax(classes == 2))
            mask = np.asarray(out["mask"])[i] == 2
            assert mask.any()
            return
    pytest.fail("no scar class sampled in 10 batches")
