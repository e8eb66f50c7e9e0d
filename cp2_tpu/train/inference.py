"""Inference utilities: whole-image and sliding-window segmentation.

Parity with the reference's mmseg inference surface
(``mmseg_/models/segmentors/encoder_decoder.py:181-243`` slide/whole
modes, ``mmseg_/apis/inference.py:11-99`` init/inference helpers).  The
sliding window unrolls over a static grid so the whole thing jits; window
logits are accumulated with a count map and averaged, matching mmseg's
overlap handling.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from cp2_tpu.config import Config
from cp2_tpu.models import build_segmentor
from cp2_tpu.ops.resize import resize_bilinear


def whole_inference(model, variables, img, out_hw=None):
    """Single forward; logits resized to ``out_hw`` (default input size)."""
    logits = model.apply(variables, img, train=False)
    out_hw = out_hw or img.shape[1:3]
    return resize_bilinear(logits.astype(jnp.float32), out_hw)


def slide_inference(
    model,
    variables,
    img,
    crop_size: Tuple[int, int],
    stride: Tuple[int, int],
    num_classes: int,
):
    """Sliding-window inference with overlap averaging.

    Matches mmseg semantics (encoder_decoder.py:181-224): windows are
    clamped to the image boundary, per-window logits are upsampled to the
    window size, summed into a canvas, and normalized by visit counts.
    """
    n, h, w, _ = img.shape
    ch, cw = crop_size
    sh, sw = stride
    grid_h = max(0, -(-(h - ch) // sh)) + 1
    grid_w = max(0, -(-(w - cw) // sw)) + 1

    canvas = jnp.zeros((n, h, w, num_classes), jnp.float32)
    counts = jnp.zeros((1, h, w, 1), jnp.float32)
    for gy in range(grid_h):
        for gx in range(grid_w):
            y0 = min(gy * sh, h - ch)
            x0 = min(gx * sw, w - cw)
            window = jax.lax.dynamic_slice(
                img, (0, y0, x0, 0), (n, ch, cw, img.shape[-1])
            )
            logits = model.apply(variables, window, train=False)
            logits = resize_bilinear(logits.astype(jnp.float32), (ch, cw))
            canvas = jax.lax.dynamic_update_slice(
                canvas,
                jax.lax.dynamic_slice(
                    canvas, (0, y0, x0, 0), (n, ch, cw, num_classes)
                ) + logits,
                (0, y0, x0, 0),
            )
            counts = jax.lax.dynamic_update_slice(
                counts,
                jax.lax.dynamic_slice(counts, (0, y0, x0, 0), (1, ch, cw, 1)) + 1.0,
                (0, y0, x0, 0),
            )
    return canvas / jnp.maximum(counts, 1.0)


def init_segmentor(
    config_path,
    checkpoint_path: Optional[str] = None,
    num_classes: Optional[int] = None,
    dtype=None,
):
    """Build a segmentor + variables from a config file and checkpoint.

    Parity with mmseg ``init_segmentor`` (apis/inference.py:11-45).
    ``config_path`` may also be a model config dict (or a Config), and
    ``dtype`` overrides the model compute dtype (bf16 for serving).
    Returns (model, variables).
    """
    cfg = (Config.fromfile(config_path) if isinstance(config_path, str)
           else config_path)
    model_cfg = dict(cfg.model if hasattr(cfg, "model") else cfg)
    if "model" in model_cfg and "type" not in model_cfg:
        model_cfg = dict(model_cfg["model"])
    if num_classes is not None:
        model_cfg["decode_head"] = dict(
            model_cfg["decode_head"], num_classes=num_classes)
    if dtype is not None:
        model_cfg["dtype"] = dtype
    model = build_segmentor(model_cfg)
    sample = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), sample, train=False)
    if checkpoint_path:
        from cp2_tpu.checkpoint.io import restore_checkpoint

        state, _ = restore_checkpoint(checkpoint_path, None)
        variables = {
            "params": state["params"],
            "batch_stats": state.get("batch_stats", {}),
        }
    return model, variables


def inference_segmentor(model, variables, img, *, mode: str = "whole", **kwargs):
    """Predicted class map (N, H, W) for a preprocessed image batch."""
    if mode == "whole":
        logits = whole_inference(model, variables, img)
    elif mode == "slide":
        logits = slide_inference(model, variables, img, **kwargs)
    else:
        raise ValueError(mode)
    return jnp.argmax(logits, axis=-1)
