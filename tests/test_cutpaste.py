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
