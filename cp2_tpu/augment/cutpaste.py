"""CutPaste defect synthesis, on device with static shapes.

Re-designs the reference's PIL-based CutPaste augmentation
(``datasets/pretrain_dataset.py:192-409``): a random patch is cut from the
image and pasted elsewhere (REGULAR: axis-aligned; SCAR: thin, rotated),
optionally into a *different* "mirror" image (MirrorVariant.OUTPUT), with
a per-pixel class mask.

The reference rotates a cropped PIL patch with ``expand=True`` — a
dynamic-shape operation.  Here the paste is expressed in the inverse
direction: for every output pixel, rotate its offset from the paste
center back into the patch frame, test the half-extent box, and gather
the source pixel.  One fixed-shape gather + mask, jit/vmap-friendly.

Class sampling: the reference fixes one random class per image at dataset
construction (:263-269); here classes are sampled per batch from the same
distribution ([0.1, 0.45, 0.45] for 3 classes, [0.1, 0.9] for 2) — the
same marginal law without host-side state.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class CutPasteConfig:
    num_classes: int = 3            # NONE + REGULAR + SCAR (or 2: NONE+REGULAR)
    max_num_patches: int = 1
    min_area_scale: float = 0.02
    max_area_scale: float = 0.15
    min_aspect_ratio: float = 1 / 3
    max_aspect_ratio: float = 4 / 3
    min_rotation: float = 0.0       # degrees (SCAR only)
    max_rotation: float = 0.0


def _sample_patch(rng, hw: Tuple[int, int], cfg: CutPasteConfig, is_scar):
    """Patch geometry: (src_cy, src_cx, half_h, half_w, dst_cy, dst_cx, θ)."""
    h, w = hw
    k_area, k_aspect, k_rot, k_src, k_dst = jax.random.split(rng, 5)

    # REGULAR: area in [min, max], aspect in [min_ar, max_ar], no rotation;
    # SCAR: area in [min, max/2], aspect in [3, 6], rotation sampled
    # (reference pretrain_dataset.py:290-311)
    area_hi = jnp.where(is_scar, cfg.max_area_scale * 0.5, cfg.max_area_scale)
    u_area = jax.random.uniform(k_area)
    area = h * w * (cfg.min_area_scale + u_area * (area_hi - cfg.min_area_scale))

    aspect_lo = jnp.where(is_scar, 3.0, cfg.min_aspect_ratio)
    aspect_hi = jnp.where(is_scar, 6.0, cfg.max_aspect_ratio)
    ua = jax.random.uniform(k_aspect)
    aspect = aspect_lo + ua * (aspect_hi - aspect_lo)

    ph = jnp.sqrt(area / aspect)
    pw = ph * aspect
    ph = jnp.clip(ph, 1.0, h - 1.0)
    pw = jnp.clip(pw, 1.0, w - 1.0)

    theta = jnp.where(
        is_scar,
        jnp.deg2rad(
            cfg.min_rotation
            + jax.random.uniform(k_rot) * (cfg.max_rotation - cfg.min_rotation)
        ),
        0.0,
    )

    # rotated bounding half-extents keep the paste inside the frame
    cos, sin = jnp.abs(jnp.cos(theta)), jnp.abs(jnp.sin(theta))
    bh = (ph * cos + pw * sin) / 2.0
    bw = (pw * cos + ph * sin) / 2.0

    u_sy, u_sx = jax.random.uniform(k_src, (2,))
    u_dy, u_dx = jax.random.uniform(k_dst, (2,))
    src_cy = ph / 2 + u_sy * (h - ph)
    src_cx = pw / 2 + u_sx * (w - pw)
    dst_cy = bh + u_dy * jnp.maximum(h - 2 * bh, 0.0)
    dst_cx = bw + u_dx * jnp.maximum(w - 2 * bw, 0.0)
    return src_cy, src_cx, ph / 2, pw / 2, dst_cy, dst_cx, theta


def _paste_one(rng, img, mirror, mask, class_value, cfg: CutPasteConfig):
    """Apply one patch of type ``class_value`` (0 = no-op)."""
    h, w = img.shape[:2]
    is_scar = class_value == 2
    src_cy, src_cx, hh, hw_, dst_cy, dst_cx, theta = _sample_patch(
        rng, (h, w), cfg, is_scar
    )

    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    dy = ys - dst_cy
    dx = xs - dst_cx
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    # rotate the offset back into the (unrotated) patch frame
    py = cos * dy + sin * dx
    px = -sin * dy + cos * dx
    inside = (jnp.abs(py) <= hh) & (jnp.abs(px) <= hw_)

    sy = jnp.clip((src_cy + py).astype(jnp.int32), 0, h - 1)
    sx = jnp.clip((src_cx + px).astype(jnp.int32), 0, w - 1)
    patch = img[sy, sx]

    active = class_value > 0
    paste_mask = inside & active
    out_img = jnp.where(paste_mask[..., None], patch, img)
    out_mirror = (
        None if mirror is None else jnp.where(paste_mask[..., None], patch, mirror)
    )
    out_mask = jnp.where(paste_mask, class_value, mask)
    return out_img, out_mirror, out_mask


def cutpaste(
    rng: jax.Array,
    img: jax.Array,
    mirror: Optional[jax.Array],
    cfg: CutPasteConfig,
):
    """Full CutPaste for one image: sample class, paste 1..max patches.

    Returns (img, mirror_or_None, mask, class_label).
    """
    k_cls, k_n, k_patches = jax.random.split(rng, 3)
    if cfg.num_classes == 3:
        p = jnp.array([0.1, 0.45, 0.45])
    else:
        p = jnp.array([0.1, 0.9])
    class_value = jax.random.choice(k_cls, cfg.num_classes, p=p)

    # 1 + randint(max_num_patches) applications (reference :383-396)
    extra = jax.random.randint(k_n, (), 0, jnp.maximum(cfg.max_num_patches, 1))
    mask = jnp.zeros(img.shape[:2], jnp.int32)
    mirror_out = mirror
    for i in range(cfg.max_num_patches):
        apply_i = (i == 0) | (i <= extra)
        k_i = jax.random.fold_in(k_patches, i)
        new_img, new_mirror, new_mask = _paste_one(
            k_i, img, mirror_out, mask, class_value * apply_i, cfg
        )
        img = new_img
        mirror_out = new_mirror
        # multiple patches OR their masks (reference :396)
        mask = jnp.maximum(mask, new_mask)
    return img, mirror_out, mask, class_value


def cutpaste_batch(
    rng: jax.Array,
    images: jax.Array,
    mirror_images: Optional[jax.Array],
    cfg: CutPasteConfig,
):
    """Vmapped CutPaste over a batch.  ``mirror_images`` selects the
    MirrorVariant.OUTPUT behavior (paste the same patch into a second
    base image, reference :339-341,367-377)."""
    n = images.shape[0]
    rngs = jax.random.split(rng, n)
    if mirror_images is None:
        def fn(key, img):
            out, _, mask, cls = cutpaste(key, img, None, cfg)
            return out, mask, cls

        imgs, masks, classes = jax.vmap(fn)(rngs, images)
        return {"image": imgs, "mask": masks, "target": classes}

    def fn2(key, img, mirror):
        out, mir, mask, cls = cutpaste(key, img, mirror, cfg)
        return out, mir, mask, cls

    imgs, mirrors, masks, classes = jax.vmap(fn2)(rngs, images, mirror_images)
    return {"image": imgs, "mirror": mirrors, "mask": masks, "target": classes}
