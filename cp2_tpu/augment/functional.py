"""Per-image augmentation primitives as pure JAX (run on device, fused).

The reference runs albumentations/torchvision on CPU workers
(``main.py:206-245``, ``loader.py:50-118``); per the rebuild's north star
these become device kernels fused into the train step: random resized
crop (gather), color jitter / grayscale (elementwise), Gaussian blur
(separable depthwise conv), flip (reverse), random erasing (mask) — all
statically shaped, vmappable, and XLA-fusable.

Conventions: images are (H, W, 3) float32 in [0, 1]; every op takes a PRNG
key; probability gates are per-image ``where`` selects (both branches are
computed — they're cheap elementwise ops and this keeps shapes static).
"""

from __future__ import annotations

import itertools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class CropParams(NamedTuple):
    """A crop box in source pixels + horizontal flip flag."""

    y0: jax.Array  # float scalar
    x0: jax.Array
    h: jax.Array
    w: jax.Array
    flip: jax.Array  # bool scalar


def sample_resized_crop(
    rng: jax.Array,
    src_hw: Tuple[int, int],
    scale: Tuple[float, float] = (0.2, 1.0),
    ratio: Tuple[float, float] = (3 / 4, 4 / 3),
    flip_p: float = 0.5,
    attempts: int = 10,
) -> CropParams:
    """torchvision-style RandomResizedCrop parameter sampling.

    Samples ``attempts`` (area, log-aspect) candidates in parallel, takes
    the first that fits, else falls back to a center crop clamped to the
    ratio range — the same selection law, vectorized for XLA.
    """
    height, width = src_hw
    area = float(height * width)
    k_area, k_ratio, k_y, k_x, k_flip = jax.random.split(rng, 5)

    target_area = area * jax.random.uniform(
        k_area, (attempts,), minval=scale[0], maxval=scale[1]
    )
    log_ratio = jax.random.uniform(
        k_ratio, (attempts,),
        minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1]),
    )
    aspect = jnp.exp(log_ratio)
    ws = jnp.sqrt(target_area * aspect)
    hs = jnp.sqrt(target_area / aspect)
    valid = (ws <= width) & (hs <= height)
    first = jnp.argmax(valid)  # first True, or 0 if none
    any_valid = jnp.any(valid)

    w_sel = ws[first]
    h_sel = hs[first]

    # fallback: clamp to ratio range, centered
    in_ratio = width / height
    fb_w = jnp.where(
        in_ratio < ratio[0], float(width),
        jnp.where(in_ratio > ratio[1], height * ratio[1], float(width)),
    )
    fb_h = jnp.where(
        in_ratio < ratio[0], width / ratio[0],
        jnp.where(in_ratio > ratio[1], float(height), float(height)),
    )

    w = jnp.where(any_valid, w_sel, fb_w)
    h = jnp.where(any_valid, h_sel, fb_h)

    u_y = jax.random.uniform(k_y)
    u_x = jax.random.uniform(k_x)
    y0 = jnp.where(any_valid, u_y * (height - h), (height - h) / 2.0)
    x0 = jnp.where(any_valid, u_x * (width - w), (width - w) / 2.0)
    flip = jax.random.bernoulli(k_flip, flip_p)
    return CropParams(y0=y0, x0=x0, h=h, w=w, flip=flip)


def crop_resize_bilinear(
    img: jax.Array, crop: CropParams, out_hw: Tuple[int, int]
) -> jax.Array:
    """Crop + resize in one bilinear resampling (half-pixel centers).

    Output pixel (i, j) samples source coordinate
    ``y0 + (i + 0.5) * h/out_h - 0.5`` — the fused form of crop-then-resize
    with align_corners=False.  Implemented with
    ``jax.image.scale_and_translate``, which lowers to two small dense
    resampling matmuls — MXU work — instead of the 2-D gather a naive
    formulation produces (gathers are the slow path on TPU; switching this
    from gathers took the fused augmentation from dominating the CP2 step
    to noise).  The horizontal flip is a reversal after resampling.
    """
    out_h, out_w = out_hw
    # the horizontal flip folds into the resample matrix as a negative x
    # scale (sample positions run right-to-left), so no reverse op — and no
    # second full-image pass — is ever materialized
    sx = out_w / crop.w
    scale = jnp.stack([
        out_h / crop.h,
        jnp.where(crop.flip, -sx, sx),
    ])
    translation = jnp.stack([
        -crop.y0 * out_h / crop.h,
        jnp.where(crop.flip, (crop.x0 + crop.w) * sx, -crop.x0 * sx),
    ])
    return jax.image.scale_and_translate(
        img,
        (out_h, out_w, img.shape[2]),
        (0, 1),
        scale,
        translation,
        method="linear",
        antialias=False,
    )


def crop_source_indices(
    crop: CropParams, out_hw: Tuple[int, int], src_hw: Tuple[int, int]
):
    """Nearest-exact source (row, col) indices for each output cell.

    This is the analytic id-map path: instead of materializing a 1..HW id
    image and warping it (reference loader.py:66-118), the warp IS the
    index computation.
    """
    out_h, out_w = out_hw
    src_h, src_w = src_hw
    rows = jnp.floor(crop.y0 + (jnp.arange(out_h) + 0.5) * (crop.h / out_h))
    cols_base = jnp.arange(out_w)
    cols_base = jnp.where(crop.flip, out_w - 1 - cols_base, cols_base)
    cols = jnp.floor(crop.x0 + (cols_base + 0.5) * (crop.w / out_w))
    rows = jnp.clip(rows.astype(jnp.int32), 0, src_h - 1)
    cols = jnp.clip(cols.astype(jnp.int32), 0, src_w - 1)
    return rows, cols


def pixel_ids_from_crop(
    crop: CropParams,
    out_hw: Tuple[int, int],
    src_hw: Tuple[int, int],
    stride: int = 1,
) -> jax.Array:
    """Warped pixel-id map computed analytically from crop geometry.

    Ids number source pixels 1..H*W row-major (reference loader.py:67).
    ``stride`` reproduces ``rescale_ids`` + nearest-exact upsample
    (loader.py:39-43,69-72): source coords are quantized to the stride
    grid's sample points (offset stride//2) before id assignment.
    """
    src_h, src_w = src_hw
    rows, cols = crop_source_indices(crop, out_hw, src_hw)
    if stride > 1:
        red_h = len(range(stride // 2, src_h, stride))
        red_w = len(range(stride // 2, src_w, stride))
        # nearest-exact map full-res coord -> reduced-grid index -> sample coord
        rows = stride // 2 + jnp.clip(
            jnp.floor((rows + 0.5) * (red_h / src_h)).astype(jnp.int32), 0, red_h - 1
        ) * stride
        cols = stride // 2 + jnp.clip(
            jnp.floor((cols + 0.5) * (red_w / src_w)).astype(jnp.int32), 0, red_w - 1
        ) * stride
    return rows[:, None] * src_w + cols[None, :] + 1


def warp_id_map(
    id_map: jax.Array, crop: CropParams, out_hw: Tuple[int, int]
) -> jax.Array:
    """Nearest-warp an arbitrary (H, W) id/region map through the crop."""
    rows, cols = crop_source_indices(crop, out_hw, id_map.shape[:2])
    return id_map[rows[:, None], cols[None, :]]


# ---------------------------------------------------------------------------
# photometric ops
# ---------------------------------------------------------------------------

_LUMA = jnp.array([0.299, 0.587, 0.114])


def _blend(a, b, factor):
    return jnp.clip(a * factor + b * (1.0 - factor), 0.0, 1.0)


def _rgb_to_hsv(rgb):
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.max(rgb, axis=-1)
    minc = jnp.min(rgb, axis=-1)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-12), 0.0)
    safe = jnp.maximum(delta, 1e-12)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(
        maxc == r, bc - gc, jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc)
    )
    h = jnp.where(delta == 0, 0.0, h)
    h = (h / 6.0) % 1.0
    return h, s, v


def _hsv_to_rgb(h, s, v):
    # sextant dispatch as elementwise selects — NOT jnp.choose, whose
    # gather lowering dominated the whole train step on TPU (90% of device
    # time went to vmapped gathers before this was select-ified)
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6

    def pick(options):
        out = options[-1]
        for idx in range(4, -1, -1):
            out = jnp.where(i == idx, options[idx], out)
        return out

    r = pick([v, q, p, p, t, v])
    g = pick([t, v, v, q, p, p])
    b = pick([p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


_JITTER_PERMS = tuple(itertools.permutations(range(4)))  # 24 op orders


def color_jitter(
    rng: jax.Array,
    img: jax.Array,
    brightness: Tuple[float, float] = (0.6, 1.4),
    contrast: Tuple[float, float] = (0.6, 1.4),
    saturation: Tuple[float, float] = (0.6, 1.4),
    hue: Tuple[float, float] = (-0.1, 0.1),
    p: float = 0.8,
    order_idx: Optional[jax.Array] = None,
) -> jax.Array:
    """Brightness/contrast/saturation/hue jitter.

    Factor ranges are the (min, max) form — albumentations
    ``A.ColorJitter(0.4, 0.4, 0.4, 0.1)`` corresponds to (0.6, 1.4) etc.

    ``order_idx`` (scalar int in [0, 24)) selects the op-composition order
    via ``lax.switch``.  The reference (torchvision/albumentations)
    shuffles the order per *call*; callers here sample one order per
    *batch* and pass it UNBATCHED through vmap, so the switch stays real
    control flow (one branch executes per step).  A per-sample (batched)
    index would make vmap execute all 24 branches — don't.  ``None``
    keeps the fixed b→c→s→h order (order 0, identical to passing 0).
    """
    k_b, k_c, k_s, k_h, k_p = jax.random.split(rng, 5)

    def op_brightness(x):
        fb = jax.random.uniform(k_b, minval=brightness[0], maxval=brightness[1])
        return jnp.clip(x * fb, 0.0, 1.0)

    def op_contrast(x):
        fc = jax.random.uniform(k_c, minval=contrast[0], maxval=contrast[1])
        return _blend(x, jnp.mean(x @ _LUMA), fc)

    def op_saturation(x):
        fs = jax.random.uniform(k_s, minval=saturation[0], maxval=saturation[1])
        return _blend(x, (x @ _LUMA)[..., None], fs)

    def op_hue(x):
        fh = jax.random.uniform(k_h, minval=hue[0], maxval=hue[1])
        h, s, v = _rgb_to_hsv(x)
        return _hsv_to_rgb((h + fh) % 1.0, s, v)

    ops = (op_brightness, op_contrast, op_saturation, op_hue)

    def composed(perm):
        def f(x):
            for i in perm:
                x = ops[i](x)
            return x
        return f

    if order_idx is None:
        out = composed(_JITTER_PERMS[0])(img)
    else:
        out = jax.lax.switch(
            order_idx, [composed(perm) for perm in _JITTER_PERMS], img
        )
    apply = jax.random.bernoulli(k_p, p)
    return jnp.where(apply, out, img)


def to_grayscale(rng: jax.Array, img: jax.Array, p: float = 0.2) -> jax.Array:
    gray = (img @ _LUMA)[..., None]
    apply = jax.random.bernoulli(rng, p)
    return jnp.where(apply, jnp.broadcast_to(gray, img.shape), img)


def _blur_tap_onehot(size: int, kernel_size: int) -> jax.Array:
    """Constant [size, taps, size] one-hot of edge-clamped tap positions.

    Row h, tap t points at source clip(h + t - half, 0, size-1) — the exact
    tap pattern of edge-replicate padding followed by a VALID 1-D
    correlation.  Sigma-independent, so XLA folds it to a constant.
    """
    half = kernel_size // 2
    rows = jnp.arange(size)[:, None]
    cols = jnp.clip(rows + jnp.arange(kernel_size)[None, :] - half, 0, size - 1)
    return jax.nn.one_hot(cols, size, dtype=jnp.float32)


def gaussian_blur(
    rng: jax.Array,
    img: jax.Array,
    sigma_range: Tuple[float, float] = (0.1, 2.0),
    p: float = 0.5,
    kernel_size: int = 13,
) -> jax.Array:
    """SimCLR-style Gaussian blur as two banded-matrix multiplies.

    Sigma is sampled per image (reference loader.py:121-130); the 13-tap
    kernel covers 3σ at σ=2.  A depthwise-conv formulation lowers to
    feature-group convs with heavy data formatting on TPU (measured ~0.5
    ms/step of pure layout copies in the CP2 pretrain step); instead the
    separable blur is expressed as ``K_v @ img @ K_hᵀ`` with the
    edge-replicate boundary handling folded into the band matrix, so the
    whole op is two MXU matmuls with no pad and no layout changes.
    """
    k_sigma, k_p = jax.random.split(rng)
    sigma = jax.random.uniform(k_sigma, minval=sigma_range[0], maxval=sigma_range[1])
    half = kernel_size // 2
    xs = jnp.arange(-half, half + 1, dtype=jnp.float32)
    kernel = jnp.exp(-0.5 * (xs / sigma) ** 2)
    kernel = kernel / kernel.sum()

    h, w = img.shape[0], img.shape[1]
    kv = jnp.einsum("t,htj->hj", kernel, _blur_tap_onehot(h, kernel_size))
    kh = kv if w == h else jnp.einsum(
        "t,wtj->wj", kernel, _blur_tap_onehot(w, kernel_size)
    )
    blurred = jnp.einsum("hs,swc->hwc", kv.astype(img.dtype), img)
    blurred = jnp.einsum("ws,hsc->hwc", kh.astype(img.dtype), blurred)
    apply = jax.random.bernoulli(k_p, p)
    return jnp.where(apply, blurred, img)


def _reflect101(coords: jax.Array, size: int) -> jax.Array:
    """OpenCV BORDER_REFLECT_101 coordinate folding: ...2 1 | 0 1 2 | 1 0..."""
    if size == 1:
        return jnp.zeros_like(coords)
    period = 2.0 * (size - 1)
    c = jnp.mod(jnp.abs(coords), period)
    return jnp.where(c > size - 1, period - c, c)


def _grid_axis_coords(
    steps: jax.Array, size: int, num_steps: int
) -> jax.Array:
    """Distorted source coordinate for each output position along one axis.

    Reproduces albumentations GridDistortion's per-cell linspace law: the
    axis is cut into ``num_steps`` cells of ``size // num_steps`` pixels;
    cell ``i`` is linearly stretched by ``steps[i]``; the remainder cell
    (when ``size % num_steps != 0``) is pinned to end exactly at ``size``.
    """
    step = size // num_steps
    i = jnp.arange(num_steps + 1)
    start = i * step
    full = start + step <= size
    widths = jnp.where(full, step * steps, 0.0)
    prev = jnp.concatenate([jnp.zeros((1,)), jnp.cumsum(widths)])[:-1]
    cur = jnp.where(full, prev + step * steps, float(size))
    end = jnp.minimum(start + step, size)
    n = jnp.maximum(end - start, 1)

    x = jnp.arange(size)
    idx = jnp.minimum(x // step, num_steps)
    t = (x - start[idx]) / jnp.maximum(n[idx] - 1, 1)
    return prev[idx] + (cur[idx] - prev[idx]) * t


def _axis_resample_matrix(coords: jax.Array, size: int) -> jax.Array:
    """(out, src) bilinear weights for 1-D coordinates — dense so the 2-D
    remap becomes two small matmuls (MXU) instead of gathers."""
    c = _reflect101(coords, size)
    f = jnp.floor(c)
    t = (c - f)[:, None]
    i0 = jnp.clip(f.astype(jnp.int32), 0, size - 1)[:, None]
    i1 = jnp.clip(i0 + 1, 0, size - 1)
    cols = jnp.arange(size)[None, :]
    return (cols == i0) * (1.0 - t) + (cols == i1) * t


def grid_distortion(
    rng: jax.Array,
    img: jax.Array,
    mask: Optional[jax.Array] = None,
    num_steps: int = 5,
    distort_limit: float = 0.3,
    p: float = 0.2,
):
    """Albumentations-style GridDistortion, image bilinear + mask nearest.

    Reference: ``A.GridDistortion(p=0.2)`` in the polyp finetune stack
    (``/root/reference/datasets/finetune_dataset.py:321``).  Per axis the
    image is cut into ``num_steps`` cells, each stretched by an independent
    factor in ``1 ± distort_limit``; out-of-range source coordinates fold
    with BORDER_REFLECT_101.  The separable remap runs as two dense
    resampling matmuls for the image; the mask warps through the same
    coordinates with nearest sampling so image and mask stay aligned.
    """
    h, w = img.shape[0], img.shape[1]
    k_x, k_y, k_p = jax.random.split(rng, 3)
    sx = 1.0 + jax.random.uniform(
        k_x, (num_steps + 1,), minval=-distort_limit, maxval=distort_limit
    )
    sy = 1.0 + jax.random.uniform(
        k_y, (num_steps + 1,), minval=-distort_limit, maxval=distort_limit
    )
    xx = _grid_axis_coords(sx, w, num_steps)
    yy = _grid_axis_coords(sy, h, num_steps)

    wx = _axis_resample_matrix(xx, w)
    wy = _axis_resample_matrix(yy, h)
    tmp = jnp.einsum("xk,ykc->yxc", wx, img)
    warped = jnp.einsum("yj,jxc->yxc", wy, tmp)

    apply = jax.random.bernoulli(k_p, p)
    out_img = jnp.where(apply, warped, img)
    if mask is None:
        return out_img

    iy = jnp.clip(jnp.round(_reflect101(yy, h)).astype(jnp.int32), 0, h - 1)
    ix = jnp.clip(jnp.round(_reflect101(xx, w)).astype(jnp.int32), 0, w - 1)
    # nearest warp as two one-hot banded matmuls (warped = Py @ m @ Px^T),
    # mirroring the image path: the 2-D fancy-index gather serializes on
    # TPU (measured 25% of the finetune step at 352^2). Exact for integer
    # class ids — each output row/col picks exactly one entry.
    p_y = jax.nn.one_hot(iy, h, dtype=jnp.float32)
    p_x = jax.nn.one_hot(ix, w, dtype=jnp.float32)
    m = mask.astype(jnp.float32)
    warped_mask = jnp.rint(
        jnp.einsum("yj,jx->yx", p_y, jnp.einsum("jk,xk->jx", m, p_x))
    ).astype(mask.dtype)
    out_mask = jnp.where(apply, warped_mask, mask)
    return out_img, out_mask


def random_erase(
    rng: jax.Array,
    img: jax.Array,
    scale: Tuple[float, float] = (0.5, 0.8),
    ratio: Tuple[float, float] = (0.8, 1.25),
    value: float = 0.0,
) -> jax.Array:
    """Erase a random rectangle to ``value`` (p=1 in the CP2 recipe).

    The reference uses torchvision RandomErasing (main.py:220-225) to
    carve the hole the foreground is pasted into; here the rectangle is a
    2-D index mask so the erase fuses with whatever follows.
    """
    h, w = img.shape[0], img.shape[1]
    k_area, k_ratio, k_y, k_x = jax.random.split(rng, 4)
    area = h * w * jax.random.uniform(k_area, minval=scale[0], maxval=scale[1])
    aspect = jnp.exp(
        jax.random.uniform(
            k_ratio, minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1])
        )
    )
    eh = jnp.clip(jnp.round(jnp.sqrt(area * aspect)), 1, h).astype(jnp.int32)
    ew = jnp.clip(jnp.round(jnp.sqrt(area / aspect)), 1, w).astype(jnp.int32)
    y0 = jax.random.randint(k_y, (), 0, jnp.maximum(h - eh + 1, 1))
    x0 = jax.random.randint(k_x, (), 0, jnp.maximum(w - ew + 1, 1))
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    inside = (ys >= y0) & (ys < y0 + eh) & (xs >= x0) & (xs < x0 + ew)
    return jnp.where(inside[..., None], value, img)
