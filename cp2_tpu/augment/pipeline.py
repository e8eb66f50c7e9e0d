"""Two-crop / background augmentation pipelines (batched, on device).

Device-side replacement for the reference's three CPU dataloader streams
(main.py:181-289):

* ``two_crop_augment_batch`` — ``A_TwoCropsTransform`` (loader.py:50-118):
  two independent crops of each foreground image with co-warped pixel-id
  and region-id maps.  Ids are computed ANALYTICALLY from the crop
  geometry (no id image is ever materialized or resized on host).
* ``background_augment_batch`` — ``BackgroundTransform`` + RandomErasing
  (main.py:206-228): an independently augmented background with a zeroed
  rectangle the foreground composites into.
* ``pretrain_batch_augment`` — fuses both into the batch dict the SSL
  step consumes; designed to be jitted together with the train step so
  raw uint8 frames are the only H2D traffic.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from cp2_tpu.augment import functional as F


@dataclass(frozen=True)
class AugmentConfig:
    out_hw: Tuple[int, int] = (224, 224)
    crop_scale: Tuple[float, float] = (0.2, 1.0)
    crop_ratio: Tuple[float, float] = (3 / 4, 4 / 3)
    jitter_p: float = 0.8
    brightness: Tuple[float, float] = (0.6, 1.4)
    contrast: Tuple[float, float] = (0.6, 1.4)
    saturation: Tuple[float, float] = (0.6, 1.4)
    hue: Tuple[float, float] = (-0.1, 0.1)
    grayscale_p: float = 0.2
    blur_p: float = 0.5
    blur_sigma: Tuple[float, float] = (0.1, 2.0)
    flip_p: float = 0.5
    erase_scale: Tuple[float, float] = (0.5, 0.8)  # foreground_{min,max}
    erase_ratio: Tuple[float, float] = (0.8, 1.25)
    pixel_ids_stride: int = 1
    # per-batch random jitter op order (reference shuffles per call). The
    # lax.switch boundary blocks photometric fusion: measured 3% step cost
    # (1000.6 vs 1032.5 img/s), so fidelity-over-speed users opt in.
    jitter_random_order: bool = False


def _photometric(rng, img, cfg: AugmentConfig, order_idx=None):
    k_j, k_g, k_b = jax.random.split(rng, 3)
    img = F.color_jitter(
        k_j, img, cfg.brightness, cfg.contrast, cfg.saturation, cfg.hue,
        cfg.jitter_p, order_idx=order_idx,
    )
    img = F.to_grayscale(k_g, img, cfg.grayscale_p)
    img = F.gaussian_blur(k_b, img, cfg.blur_sigma, cfg.blur_p)
    return img


def _one_view(rng, img, region_map, cfg: AugmentConfig, order_idx=None):
    src_hw = img.shape[:2]
    k_crop, k_photo = jax.random.split(rng)
    crop = F.sample_resized_crop(
        k_crop, src_hw, cfg.crop_scale, cfg.crop_ratio, cfg.flip_p
    )
    view = F.crop_resize_bilinear(img, crop, cfg.out_hw)
    view = _photometric(k_photo, view, cfg, order_idx)
    pixel_ids = F.pixel_ids_from_crop(crop, cfg.out_hw, src_hw, cfg.pixel_ids_stride)
    if region_map is None:
        region_ids = pixel_ids
    else:
        region_ids = F.warp_id_map(region_map, crop, cfg.out_hw)
    return view, pixel_ids.astype(jnp.int32), region_ids.astype(jnp.int32)


def _to_float(img):
    if img.dtype == jnp.uint8:
        return img.astype(jnp.float32) / 255.0
    return img.astype(jnp.float32)


def two_crop_augment_batch(
    rng: jax.Array,
    images: jax.Array,
    region_maps: Optional[jax.Array],
    cfg: AugmentConfig,
):
    """Two independently augmented views per image with warped id maps.

    Returns dict with img_a/img_b (N, H, W, 3) float32 and
    pixel_ids_a/b, region_ids_a/b (N, H, W) int32.
    """
    n = images.shape[0]
    k_order, rng = jax.random.split(rng)
    rngs = jax.random.split(rng, n * 2).reshape(n, 2, 2)
    # one jitter op order per batch+view, UNBATCHED through vmap (a
    # per-sample order would make vmap execute all 24 switch branches —
    # reference shuffles per call; per-batch is the same marginal law)
    if cfg.jitter_random_order:
        order_a, order_b = jax.random.randint(k_order, (2,), 0, 24)
    else:
        order_a = order_b = None

    def per_image(keys, img, region):
        img = _to_float(img)
        a = _one_view(keys[0], img, region, cfg, order_a)
        b = _one_view(keys[1], img, region, cfg, order_b)
        return a, b

    if region_maps is None:
        (va, ia, ra), (vb, ib, rb) = jax.vmap(
            lambda k, im: per_image(k, im, None)
        )(rngs, images)
    else:
        (va, ia, ra), (vb, ib, rb) = jax.vmap(per_image)(rngs, images, region_maps)
    return {
        "img_a": va,
        "img_b": vb,
        "pixel_ids_a": ia,
        "pixel_ids_b": ib,
        "region_ids_a": ra,
        "region_ids_b": rb,
    }


def background_augment_batch(rng: jax.Array, images: jax.Array, cfg: AugmentConfig):
    """Background stream: crop + photometric + guaranteed erase-to-zero."""
    n = images.shape[0]
    k_order, rng = jax.random.split(rng)
    rngs = jax.random.split(rng, n)
    order_idx = (
        jax.random.randint(k_order, (), 0, 24)  # unbatched: see above
        if cfg.jitter_random_order else None
    )

    def per_image(key, img):
        img = _to_float(img)
        k_crop, k_photo, k_erase = jax.random.split(key, 3)
        crop = F.sample_resized_crop(
            k_crop, img.shape[:2], cfg.crop_scale, cfg.crop_ratio, cfg.flip_p
        )
        view = F.crop_resize_bilinear(img, crop, cfg.out_hw)
        view = _photometric(k_photo, view, cfg, order_idx)
        return F.random_erase(k_erase, view, cfg.erase_scale, cfg.erase_ratio, 0.0)

    return jax.vmap(per_image)(rngs, images)


@dataclass(frozen=True)
class FinetuneAugmentConfig:
    """Polyp finetune train-time augs (reference finetune_dataset.py:301-337).

    Host already did SmallestMaxSize + RandomCrop (geometry); device does
    flips (image+mask), color jitter, GridDistortion (image bilinear +
    mask nearest through the same warp), and Gaussian noise.
    """

    hflip_p: float = 0.5
    vflip_p: float = 0.5
    jitter_p: float = 0.75
    brightness: Tuple[float, float] = (0.65, 1.35)
    contrast: Tuple[float, float] = (0.5, 1.5)
    saturation: Tuple[float, float] = (0.0, 1.0)
    hue: Tuple[float, float] = (-0.1, 0.1)
    noise_p: float = 0.5
    noise_var: Tuple[float, float] = (10.0, 50.0)  # on the 0..255 scale
    distort_p: float = 0.2
    distort_limit: float = 0.3
    jitter_random_order: bool = False  # see AugmentConfig
    # A.RandomBrightnessContrast (lemon stack only): img*alpha + beta with
    # alpha = 1 + U(contrast), beta = U(brightness) (brightness_by_max)
    bc_p: float = 0.0
    bc_brightness: Tuple[float, float] = (0.0, 0.5)
    bc_contrast: Tuple[float, float] = (0.0, 0.5)


def lemon_augment_config() -> "FinetuneAugmentConfig":
    """Lemon-defect train stack (reference finetune_dataset.py:349-367):
    HFlip + VFlip + GridDistortion(p=0.2) +
    RandomBrightnessContrast((0,0.5),(0,0.5)) + GaussNoise() —
    no ColorJitter."""
    return FinetuneAugmentConfig(jitter_p=0.0, bc_p=0.5)


def finetune_augment_batch(
    rng: jax.Array,
    images: jax.Array,
    masks: jax.Array,
    cfg: FinetuneAugmentConfig,
):
    """Co-augment image+mask batches on device for supervised training."""
    n = images.shape[0]
    k_order, rng = jax.random.split(rng)
    rngs = jax.random.split(rng, n)
    order_idx = (
        jax.random.randint(k_order, (), 0, 24)  # unbatched: see above
        if cfg.jitter_random_order else None
    )

    def per_image(key, img, mask):
        img = _to_float(img)
        k_h, k_v, k_j, k_n, k_d, k_bc = jax.random.split(key, 6)
        do_h = jax.random.bernoulli(k_h, cfg.hflip_p)
        do_v = jax.random.bernoulli(k_v, cfg.vflip_p)
        img = jnp.where(do_h, img[:, ::-1], img)
        mask = jnp.where(do_h, mask[:, ::-1], mask)
        img = jnp.where(do_v, img[::-1], img)
        mask = jnp.where(do_v, mask[::-1], mask)
        if cfg.jitter_p > 0:
            img = F.color_jitter(
                k_j, img, cfg.brightness, cfg.contrast, cfg.saturation,
                cfg.hue, cfg.jitter_p, order_idx=order_idx,
            )
        if cfg.bc_p > 0:
            k_a, k_b, k_p = jax.random.split(k_bc, 3)
            alpha = 1.0 + jax.random.uniform(
                k_a, minval=cfg.bc_contrast[0], maxval=cfg.bc_contrast[1]
            )
            beta = jax.random.uniform(
                k_b, minval=cfg.bc_brightness[0], maxval=cfg.bc_brightness[1]
            )
            do_bc = jax.random.bernoulli(k_p, cfg.bc_p)
            img = jnp.where(do_bc, jnp.clip(img * alpha + beta, 0.0, 1.0), img)
        if cfg.distort_p > 0:
            img, mask = F.grid_distortion(
                k_d, img, mask,
                distort_limit=cfg.distort_limit, p=cfg.distort_p,
            )
        k_var, k_gauss, k_p = jax.random.split(k_n, 3)
        var = jax.random.uniform(
            k_var, minval=cfg.noise_var[0], maxval=cfg.noise_var[1]
        )
        noise = jax.random.normal(k_gauss, img.shape) * jnp.sqrt(var) / 255.0
        apply_noise = jax.random.bernoulli(k_p, cfg.noise_p)
        img = jnp.where(apply_noise, jnp.clip(img + noise, 0.0, 1.0), img)
        return img, mask

    return jax.vmap(per_image)(rngs, images, masks)


def eval_augment_batch(
    rng: jax.Array,
    images: jax.Array,
    masks: jax.Array,
    *,
    hflip_p: float = 0.5,
    vflip_p: float = 0.5,
    distort_p: float = 0.0,
    distort_limit: float = 0.3,
):
    """Val-time augmentations (reference transform_val stacks).

    The reference's *val* loaders are stochastic: polyp applies H/V flips
    (finetune_dataset.py:325-336), lemon applies HFlip + GridDistortion
    (:368-377).  Image and mask are co-transformed so metrics remain
    consistent; images are float in [0, 1].
    """
    rngs = jax.random.split(rng, images.shape[0])

    def per_image(key, img, mask):
        k_h, k_v, k_d = jax.random.split(key, 3)
        if hflip_p > 0:
            do_h = jax.random.bernoulli(k_h, hflip_p)
            img = jnp.where(do_h, img[:, ::-1], img)
            mask = jnp.where(do_h, mask[:, ::-1], mask)
        if vflip_p > 0:
            do_v = jax.random.bernoulli(k_v, vflip_p)
            img = jnp.where(do_v, img[::-1], img)
            mask = jnp.where(do_v, mask[::-1], mask)
        if distort_p > 0:
            img, mask = F.grid_distortion(
                k_d, img, mask, distort_limit=distort_limit, p=distort_p
            )
        return img, mask

    return jax.vmap(per_image)(rngs, images, masks)


def pretrain_batch_augment(
    rng: jax.Array,
    raw: Dict[str, jax.Array],
    cfg: AugmentConfig,
) -> Dict[str, jax.Array]:
    """Full CP2 pretrain batch from raw frames.

    ``raw`` keys: ``fg`` (N,H,W,3) foreground images, ``bg0``/``bg1``
    background images, optional ``region_maps`` (N,H,W) SAM region ids.
    """
    k_fg, k_b0, k_b1 = jax.random.split(rng, 3)
    batch = two_crop_augment_batch(k_fg, raw["fg"], raw.get("region_maps"), cfg)
    batch["bg0"] = background_augment_batch(k_b0, raw["bg0"], cfg)
    batch["bg1"] = background_augment_batch(k_b1, raw["bg1"], cfg)
    return batch
