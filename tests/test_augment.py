"""On-device augmentation: analytic id maps, erase, photometric gates."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cp2_tpu.augment import AugmentConfig, pretrain_batch_augment
from cp2_tpu.augment import functional as F
from cp2_tpu.ops import rescale_ids, nearest_exact_resize


def _identity_crop(h, w, flip=False):
    return F.CropParams(
        y0=jnp.float32(0), x0=jnp.float32(0),
        h=jnp.float32(h), w=jnp.float32(w), flip=jnp.asarray(flip),
    )


def test_pixel_ids_identity_crop():
    h, w = 12, 16
    ids = np.asarray(F.pixel_ids_from_crop(_identity_crop(h, w), (h, w), (h, w)))
    np.testing.assert_array_equal(ids, np.arange(1, h * w + 1).reshape(h, w))


def test_pixel_ids_flip():
    h, w = 8, 8
    ids = np.asarray(
        F.pixel_ids_from_crop(_identity_crop(h, w, flip=True), (h, w), (h, w))
    )
    np.testing.assert_array_equal(ids, np.arange(1, h * w + 1).reshape(h, w)[:, ::-1])


def test_pixel_ids_stride_matches_reference_semantics():
    """stride>1 must equal rescale_ids + nearest-exact upsample (loader.py:66-72)."""
    h, w = 10, 14
    stride = 2
    base = jnp.arange(1, h * w + 1).reshape(h, w)
    reference = nearest_exact_resize(rescale_ids(base, stride), (h, w))
    ours = F.pixel_ids_from_crop(_identity_crop(h, w), (h, w), (h, w), stride=stride)
    np.testing.assert_array_equal(np.asarray(ours), np.asarray(reference))


def test_crop_ids_correspond_to_overlap():
    """Two crops of the same image share ids exactly on their overlap."""
    src = (20, 20)
    out = (10, 10)
    crop_a = F.CropParams(jnp.float32(0), jnp.float32(0), jnp.float32(10), jnp.float32(10), jnp.asarray(False))
    crop_b = F.CropParams(jnp.float32(2), jnp.float32(4), jnp.float32(10), jnp.float32(10), jnp.asarray(False))
    ids_a = np.asarray(F.pixel_ids_from_crop(crop_a, out, src))
    ids_b = np.asarray(F.pixel_ids_from_crop(crop_b, out, src))
    shared = np.intersect1d(ids_a, ids_b)
    assert shared.size > 0
    # ids are consistent: same id means same source pixel by construction
    assert ids_a.max() <= src[0] * src[1]


def test_crop_resize_matches_gather_reference():
    """scale_and_translate formulation == explicit bilinear gather."""
    r = np.random.RandomState(0)
    img = jnp.asarray(r.rand(40, 48, 3).astype(np.float32))
    crop = F.CropParams(
        y0=jnp.float32(5.3), x0=jnp.float32(7.9),
        h=jnp.float32(20.4), w=jnp.float32(24.7), flip=jnp.asarray(True),
    )
    out = np.asarray(F.crop_resize_bilinear(img, crop, (16, 16)))

    # reference: direct gather interpolation at src = y0 + (i+.5)*h/o - .5
    ys = 5.3 + (np.arange(16) + 0.5) * (20.4 / 16) - 0.5
    cols = 16 - 1 - np.arange(16)  # flip
    xs = 7.9 + (cols + 0.5) * (24.7 / 16) - 0.5
    y0f, x0f = np.floor(ys), np.floor(xs)
    wy, wx = (ys - y0f)[:, None, None], (xs - x0f)[None, :, None]
    y0i = np.clip(y0f.astype(int), 0, 39); y1i = np.clip(y0i + 1, 0, 39)
    x0i = np.clip(x0f.astype(int), 0, 47); x1i = np.clip(x0i + 1, 0, 47)
    a = np.asarray(img)
    top = a[y0i][:, x0i] * (1 - wx) + a[y0i][:, x1i] * wx
    bot = a[y1i][:, x0i] * (1 - wx) + a[y1i][:, x1i] * wx
    ref = top * (1 - wy) + bot * wy
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_random_erase_zeroes_one_rect():
    img = jnp.ones((32, 32, 3))
    out = np.asarray(F.random_erase(jax.random.PRNGKey(0), img, (0.3, 0.5), (0.8, 1.25)))
    zero_mask = (out[..., 0] == 0)
    area = zero_mask.sum()
    assert 0.2 * 32 * 32 < area < 0.7 * 32 * 32
    # the zero region is a contiguous rectangle
    rows = np.where(zero_mask.any(1))[0]
    cols = np.where(zero_mask.any(0))[0]
    assert zero_mask[rows[0]:rows[-1] + 1, cols[0]:cols[-1] + 1].all()


def test_color_jitter_zero_p_is_identity():
    img = jnp.asarray(np.random.RandomState(0).rand(8, 8, 3).astype(np.float32))
    out = F.color_jitter(jax.random.PRNGKey(0), img, p=0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img))


def test_color_jitter_order_switch():
    """Per-batch random op order: order 0 reproduces the fixed b→c→s→h
    composition exactly; other orders change the output; the unbatched
    switch index works under vmap (one real branch, not 24 selects)."""
    img = jnp.asarray(np.random.RandomState(1).rand(8, 8, 3).astype(np.float32))
    key = jax.random.PRNGKey(5)
    fixed = F.color_jitter(key, img, p=1.0)
    order0 = F.color_jitter(key, img, p=1.0, order_idx=jnp.asarray(0))
    # switch vs inline path fuse differently: tolerance for float noise
    np.testing.assert_allclose(
        np.asarray(order0), np.asarray(fixed), rtol=1e-4, atol=1e-6
    )
    others = [
        np.asarray(F.color_jitter(key, img, p=1.0, order_idx=jnp.asarray(i)))
        for i in (1, 7, 23)
    ]
    assert any(not np.allclose(o, np.asarray(fixed)) for o in others)

    imgs = jnp.stack([img, img * 0.5])

    @jax.jit
    def batched(key, imgs):
        k_o, k_j = jax.random.split(key)
        order = jax.random.randint(k_o, (), 0, 24)
        return jax.vmap(
            lambda im: F.color_jitter(k_j, im, p=1.0, order_idx=order)
        )(imgs)

    out = batched(jax.random.PRNGKey(9), imgs)
    assert out.shape == imgs.shape and np.isfinite(np.asarray(out)).all()


def test_jitter_random_order_config_knob():
    from cp2_tpu.augment.pipeline import AugmentConfig, background_augment_batch

    imgs = jnp.asarray(
        (np.random.RandomState(2).rand(2, 40, 40, 3) * 255).astype(np.uint8)
    )
    cfg = AugmentConfig(out_hw=(32, 32), jitter_random_order=True)
    out = jax.jit(
        lambda r, x: background_augment_batch(r, x, cfg)
    )(jax.random.PRNGKey(0), imgs)
    assert out.shape == (2, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_gaussian_blur_preserves_mean():
    img = jnp.asarray(np.random.RandomState(0).rand(16, 16, 3).astype(np.float32))
    out = F.gaussian_blur(jax.random.PRNGKey(3), img, (1.9, 2.0), p=1.0)
    assert abs(float(out.mean()) - float(img.mean())) < 0.02
    assert float(out.std()) < float(img.std())  # blur reduces variance


def test_gaussian_blur_matches_depthwise_conv_reference():
    """The banded-matmul blur must equal edge-pad + VALID depthwise conv.

    Reference semantics: loader.py:121-130 (PIL GaussianBlur with clamped
    borders).  This pins the MXU formulation to the straightforward conv
    formulation it replaced, per shape incl. non-square.
    """

    def conv_blur(key, img, kernel_size=13):
        k_sigma, _ = jax.random.split(key)
        sigma = jax.random.uniform(k_sigma, minval=0.1, maxval=2.0)
        half = kernel_size // 2
        xs = jnp.arange(-half, half + 1, dtype=jnp.float32)
        kernel = jnp.exp(-0.5 * (xs / sigma) ** 2)
        kernel = kernel / kernel.sum()
        x = jnp.pad(img, ((half, half), (half, half), (0, 0)), mode="edge")[None]
        kv = kernel.reshape(kernel_size, 1, 1, 1)
        kh = kernel.reshape(1, kernel_size, 1, 1)
        dn = jax.lax.conv_dimension_numbers(
            x.shape, (1, 1, 1, 1), ("NHWC", "HWIO", "NHWC")
        )
        b = x
        for k in (kv, kh):
            b = jax.lax.conv_general_dilated(
                b,
                jnp.broadcast_to(k, k.shape[:2] + (1, 3)),
                (1, 1),
                "VALID",
                dimension_numbers=dn,
                feature_group_count=3,
            )
        return b[0]

    rs = np.random.RandomState(1)
    for hw in [(16, 16), (31, 17)]:
        img = jnp.asarray(rs.rand(*hw, 3).astype(np.float32))
        key = jax.random.PRNGKey(7)
        want = conv_blur(key, img)
        got = F.gaussian_blur(key, img, (0.1, 2.0), p=1.0)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=0, atol=2e-6
        )


@pytest.mark.slow
def test_pretrain_batch_augment_shapes_and_jit():
    cfg = AugmentConfig(out_hw=(32, 32))
    raw = {
        "fg": jnp.asarray(
            (np.random.RandomState(0).rand(2, 48, 48, 3) * 255).astype(np.uint8)
        ),
        "bg0": jnp.asarray(
            (np.random.RandomState(1).rand(2, 48, 48, 3) * 255).astype(np.uint8)
        ),
        "bg1": jnp.asarray(
            (np.random.RandomState(2).rand(2, 48, 48, 3) * 255).astype(np.uint8)
        ),
    }
    fn = jax.jit(lambda r, x: pretrain_batch_augment(r, x, cfg))
    batch = fn(jax.random.PRNGKey(0), raw)
    assert batch["img_a"].shape == (2, 32, 32, 3)
    assert batch["pixel_ids_a"].shape == (2, 32, 32)
    assert batch["bg0"].shape == (2, 32, 32, 3)
    # the background erase leaves a zero rectangle for compositing
    assert bool((np.asarray(batch["bg0"][..., 0]) == 0).any())
    # images normalized to [0, 1]
    assert float(batch["img_a"].max()) <= 1.0 + 1e-6
    # region ids default to pixel ids when no SAM maps are given
    np.testing.assert_array_equal(
        np.asarray(batch["region_ids_a"]), np.asarray(batch["pixel_ids_a"])
    )


# ---------------------------------------------------------------------------
# GridDistortion (reference finetune_dataset.py:321, A.GridDistortion(p=0.2))
# ---------------------------------------------------------------------------


def _np_grid_axis_coords(steps, size, num_steps):
    """Independent numpy transliteration of the albumentations law: per-cell
    linspace with stretched widths, remainder cell pinned to ``size``."""
    step = size // num_steps
    xx = np.zeros(size, np.float64)
    prev = 0.0
    for idx in range(num_steps + 1):
        start = idx * step
        end = start + step
        if end > size:
            end = size
            cur = float(size)
        else:
            cur = prev + step * steps[idx]
        if end > start:
            xx[start:end] = np.linspace(prev, cur, end - start)
        prev = cur
    return xx


# NOTE: sizes where (num_steps+1) cells don't cover the axis (size//num_steps
# * (num_steps+1) < size, e.g. 7px/5 steps) are excluded: there albumentations
# leaves trailing pixels mapped to coordinate 0 (an artifact of its loop); we
# extend the last cell linearly instead.  Real sizes (224, 352, ...) agree.
@pytest.mark.parametrize("size,num_steps", [(20, 5), (22, 5), (33, 4), (224, 5)])
def test_grid_axis_coords_matches_linspace_law(size, num_steps):
    r = np.random.RandomState(0)
    steps = 1.0 + r.uniform(-0.3, 0.3, num_steps + 1)
    got = np.asarray(F._grid_axis_coords(jnp.asarray(steps, jnp.float32),
                                         size, num_steps))
    want = _np_grid_axis_coords(steps, size, num_steps)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_grid_distortion_zero_limit_near_identity():
    # with all stretch factors == 1 the coordinate map deviates from the
    # identity by < 1.01 px (the per-cell inclusive-linspace quirk the
    # reference library also has), so a warp of a smooth image barely moves
    h = w = 40
    img = jnp.broadcast_to(
        (jnp.arange(w) / w)[None, :, None], (h, w, 3)
    ).astype(jnp.float32)
    mask = (jnp.arange(w)[None, :] > w // 2).astype(jnp.int32) * jnp.ones(
        (h, 1), jnp.int32
    )
    out, m = F.grid_distortion(
        jax.random.PRNGKey(0), img, mask, distort_limit=0.0, p=1.0
    )
    coords = np.asarray(F._grid_axis_coords(jnp.ones(6), w, 5))
    assert np.abs(coords - np.arange(w)).max() < 1.01
    assert float(jnp.abs(out - img).max()) < 1.5 / 40 + 1e-3
    assert int(jnp.abs(m - mask).sum()) <= 2 * h  # at most the boundary col


def test_grid_distortion_p_zero_is_identity():
    r = np.random.RandomState(1)
    img = jnp.asarray(r.rand(24, 24, 3), jnp.float32)
    mask = jnp.asarray((r.rand(24, 24) > 0.5).astype(np.int32))
    out, m = F.grid_distortion(jax.random.PRNGKey(3), img, mask, p=0.0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(img))
    np.testing.assert_array_equal(np.asarray(m), np.asarray(mask))


def test_grid_distortion_mask_image_co_warp():
    # paint the mask INTO the image; after warping, the thresholded image
    # must agree with the warped mask except near interpolation boundaries
    h = w = 48
    r = np.random.RandomState(2)
    mask_np = np.zeros((h, w), np.int32)
    mask_np[10:30, 15:40] = 1
    img = jnp.asarray(
        np.repeat(mask_np[..., None], 3, axis=2).astype(np.float32)
    )
    mask = jnp.asarray(mask_np)
    out, m = F.grid_distortion(
        jax.random.PRNGKey(7), img, mask, distort_limit=0.3, p=1.0
    )
    out_np = np.asarray(out[..., 0])
    m_np = np.asarray(m)
    assert set(np.unique(m_np)).issubset({0, 1})  # nearest: no new values
    mismatch = np.mean((out_np > 0.5) != (m_np == 1))
    assert mismatch < 0.03, mismatch
    # the warp actually did something
    assert np.abs(out_np - np.asarray(img[..., 0])).max() > 0.1


def test_grid_distortion_bounds_and_batch_pipeline():
    from cp2_tpu.augment.pipeline import FinetuneAugmentConfig, finetune_augment_batch

    r = np.random.RandomState(3)
    imgs = jnp.asarray((r.rand(2, 32, 32, 3) * 255).astype(np.uint8))
    masks = jnp.asarray((r.rand(2, 32, 32) > 0.5).astype(np.int32))
    cfg = FinetuneAugmentConfig(distort_p=1.0)
    out, m = jax.jit(
        lambda k, i, ma: finetune_augment_batch(k, i, ma, cfg)
    )(jax.random.PRNGKey(0), imgs, masks)
    assert out.shape == (2, 32, 32, 3) and m.shape == (2, 32, 32)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
    assert set(np.unique(np.asarray(m))).issubset({0, 1})


def test_lemon_brightness_contrast_law():
    """RandomBrightnessContrast (lemon stack): img*alpha + beta with
    alpha in 1+contrast_limit, beta in brightness_limit, both non-negative
    for the lemon ranges — so pixels never darken, and with flips/noise/
    distortion off the map is exactly affine-then-clip."""
    from cp2_tpu.augment import FinetuneAugmentConfig, finetune_augment_batch

    cfg = FinetuneAugmentConfig(
        jitter_p=0.0, bc_p=1.0, hflip_p=0.0, vflip_p=0.0,
        noise_p=0.0, distort_p=0.0,
    )
    rng = jax.random.PRNGKey(3)
    imgs = jnp.full((4, 8, 8, 3), 0.25, jnp.float32)
    masks = jnp.zeros((4, 8, 8), jnp.int32)
    out, m = finetune_augment_batch(rng, imgs, masks, cfg)
    assert np.array_equal(np.asarray(m), np.asarray(masks))
    out = np.asarray(out)
    # constant input stays spatially constant under a pointwise affine map
    assert np.allclose(out.max(axis=(1, 2, 3)), out.min(axis=(1, 2, 3)))
    vals = out[:, 0, 0, 0]
    # alpha in [1, 1.5], beta in [0, 0.5] -> 0.25 <= v <= 0.875 (pre-clip)
    assert (vals >= 0.25 - 1e-6).all() and (vals <= 0.875 + 1e-6).all()
    # not the identity for all samples (bc_p=1 guarantees application)
    assert (np.abs(vals - 0.25) > 1e-4).any()


def test_lemon_augment_config_disables_jitter():
    from cp2_tpu.augment import lemon_augment_config

    cfg = lemon_augment_config()
    assert cfg.jitter_p == 0.0 and cfg.bc_p == 0.5
    assert cfg.distort_p == 0.2 and cfg.noise_p == 0.5
