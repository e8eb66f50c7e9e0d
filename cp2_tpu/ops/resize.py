"""Resizing ops with reference-exact semantics.

* ``nearest_exact_resize`` reproduces cv2.INTER_NEAREST_EXACT (used by the
  reference to up/down-sample pixel-id maps, ``loader.py:70-83``): the
  source index for output cell i is ``floor((i + 0.5) * src/dst)`` —
  half-pixel-center nearest sampling.  Being a pure gather it runs on
  device, unlike the reference's host-side cv2 call.
* ``resize_bilinear`` matches torch ``F.interpolate(mode='bilinear',
  align_corners=False)`` — the mode mmseg's ``resize`` wrapper uses for
  logit upsampling (reference ``networks/segment_network.py:222-228``).
* ``rescale_ids`` strided id subsampling (reference ``loader.py:39-43``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rescale_ids(pixel_ids: jax.Array, stride: int) -> jax.Array:
    """Subsample an id map with half-stride offset (reference loader.py:39-43)."""
    return pixel_ids[..., stride // 2 :: stride, stride // 2 :: stride]


def _nearest_exact_indices(dst_size: int, src_size: int) -> jax.Array:
    """Source indices for half-pixel-center nearest sampling."""
    scale = src_size / dst_size
    idx = jnp.floor((jnp.arange(dst_size, dtype=jnp.float32) + 0.5) * scale)
    return jnp.clip(idx.astype(jnp.int32), 0, src_size - 1)


def nearest_exact_resize(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """Nearest-exact resize of the trailing two spatial dims of ``x``.

    Works for (H, W), (B, H, W) or (..., H, W) arrays of any dtype —
    suitable for integer id maps where interpolation must never blend ids.
    """
    src_h, src_w = x.shape[-2], x.shape[-1]
    out_h, out_w = out_hw
    rows = _nearest_exact_indices(out_h, src_h)
    cols = _nearest_exact_indices(out_w, src_w)
    return x[..., rows[:, None], cols[None, :]]


def resize(x: jax.Array, size: tuple[int, int] | None = None,
           scale_factor: float | None = None, mode: str = "bilinear",
           align_corners: bool = False) -> jax.Array:
    """mmseg's ``resize`` wrapper surface (mmseg_/ops/wrappers.py:7-27).

    align_corners=True maps to jax's non-half-pixel variants; the wrapper
    exists for API parity — prefer :func:`resize_bilinear` /
    :func:`nearest_exact_resize` directly.
    """
    if size is None:
        size = (int(x.shape[1] * scale_factor), int(x.shape[2] * scale_factor))
    if mode in ("bilinear", "linear"):
        if align_corners:
            n, _, _, c = x.shape
            return jax.image.resize(x, (n, *size, c), method="triangle")
        return resize_bilinear(x, size)
    if mode == "nearest":
        return nearest_exact_resize(
            jnp.moveaxis(x, -1, 1), size
        ).transpose(0, 2, 3, 1) if x.ndim == 4 else nearest_exact_resize(x, size)
    raise ValueError(mode)


def upsample(x: jax.Array, scale_factor: int = 2, mode: str = "nearest") -> jax.Array:
    """mmseg ``Upsample`` module equivalent (wrappers.py:29)."""
    n, h, w, c = x.shape
    method = "nearest" if mode == "nearest" else "linear"
    return jax.image.resize(x, (n, h * scale_factor, w * scale_factor, c), method)


def resize_bilinear(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """Bilinear resize (align_corners=False) of NHWC tensors.

    ``jax.image.resize(method='linear')`` uses half-pixel centers, the same
    convention as torch align_corners=False, so segmentation logits resized
    to label resolution match the reference numerically.
    """
    if x.ndim != 4:
        raise ValueError(f"expected NHWC, got {x.shape=}")
    n, _, _, c = x.shape
    return jax.image.resize(x, (n, out_hw[0], out_hw[1], c), method="linear")
