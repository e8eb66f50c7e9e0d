"""Core numeric ops: correspondence math, losses, metrics, resizing."""

from cp2_tpu.ops.correlation import (
    dense_loss_stats,
    get_correlation_map,
    get_masked_correlation_map,
    masked_iou,
)
from cp2_tpu.ops.resize import resize_bilinear, nearest_exact_resize, rescale_ids

__all__ = [
    "dense_loss_stats",
    "get_correlation_map",
    "get_masked_correlation_map",
    "masked_iou",
    "resize_bilinear",
    "nearest_exact_resize",
    "rescale_ids",
]
