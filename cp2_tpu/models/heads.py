"""Decode heads: ASPP (DeepLabV3) and FCN, with the dense-contrast branch.

Re-designs the reference heads for NHWC/TPU:
* ``ASPPHead`` — reference ``mmseg_/models/decode_heads/aspp_head.py:53-117``:
  global image pool branch + parallel atrous convs + bottleneck, then either
  the ``conv_seg`` classifier or — when ``contrast=True`` — a 1x1-conv MLP
  projecting to a ``contrast_dim`` (128) dense embedding
  (``aspp_head.py:93-97,113-116``).
* ``FCNHead`` — reference ``fcn_head.py:10-91``: stack of 3x3 convs with
  optional input concat; ``num_convs=0`` is the identity passthrough the
  MoCo config uses (``configs/config_moco.py:22-29``).

Dropout uses flax's deterministic flag; atrous convs map to XLA
``conv_general_dilated`` which tiles directly onto the MXU.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from cp2_tpu.models.layers import ConvModule, ConvMLP
from cp2_tpu.models.registry import HEADS

Dtype = Any


def _select_input(inputs, in_index):
    if isinstance(inputs, (tuple, list)):
        return inputs[in_index]
    return inputs


@HEADS.register
class ASPPHead(nn.Module):
    in_channels: int = 2048
    channels: int = 512
    num_classes: Optional[int] = None
    dilations: Sequence[int] = (1, 6, 12, 18)
    in_index: int = -1
    dropout_ratio: float = 0.1
    contrast: bool = False
    contrast_dim: int = 128
    norm_cfg: Optional[dict] = None
    align_corners: bool = False
    loss_decode: Optional[dict] = None
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, inputs, *, train: bool = True):
        x = _select_input(inputs, self.in_index).astype(self.dtype)
        n, h, w, _ = x.shape
        kw = dict(norm_cfg=self.norm_cfg, dtype=self.dtype, axis_name=self.axis_name)

        # image-level pooled branch, broadcast back to the feature grid
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        pooled = ConvModule(self.channels, 1, name="image_pool", **kw)(pooled, train=train)
        # bilinear resize of a 1x1 map == broadcast
        branches = [jnp.broadcast_to(pooled, (n, h, w, self.channels))]

        for i, dilation in enumerate(self.dilations):
            branches.append(
                ConvModule(
                    self.channels,
                    1 if dilation == 1 else 3,
                    dilation=dilation,
                    name=f"aspp_{i}",
                    **kw,
                )(x, train=train)
            )
        y = jnp.concatenate(branches, axis=-1)
        y = ConvModule(self.channels, 3, name="bottleneck", **kw)(y, train=train)

        if self.contrast:
            return ConvMLP(
                self.channels, self.contrast_dim, dtype=self.dtype, name="contrast_conv"
            )(y)
        if self.dropout_ratio > 0:
            y = nn.Dropout(self.dropout_ratio, deterministic=not train)(y)
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="conv_seg")(y)


@HEADS.register
class FCNHead(nn.Module):
    in_channels: int = 2048
    channels: int = 2048
    num_classes: Optional[int] = None
    num_convs: int = 2
    kernel_size: int = 3
    concat_input: bool = True
    dilation: int = 1
    in_index: int = -1
    dropout_ratio: float = 0.1
    contrast: bool = False
    contrast_dim: int = 128
    norm_cfg: Optional[dict] = None
    align_corners: bool = False
    loss_decode: Optional[dict] = None
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, inputs, *, train: bool = True):
        x = _select_input(inputs, self.in_index).astype(self.dtype)
        kw = dict(norm_cfg=self.norm_cfg, dtype=self.dtype, axis_name=self.axis_name)

        if self.num_convs == 0:
            if self.in_channels != self.channels:
                raise ValueError("num_convs=0 requires in_channels == channels")
            y = x
        else:
            y = x
            for i in range(self.num_convs):
                y = ConvModule(
                    self.channels,
                    self.kernel_size,
                    dilation=self.dilation,
                    name=f"convs_{i}",
                    **kw,
                )(y, train=train)
            if self.concat_input:
                y = ConvModule(
                    self.channels, self.kernel_size, name="conv_cat", **kw
                )(jnp.concatenate([x, y], axis=-1), train=train)

        if self.contrast:
            return ConvMLP(
                self.channels, self.contrast_dim, dtype=self.dtype, name="contrast_conv"
            )(y)
        if self.dropout_ratio > 0 and self.num_convs > 0:
            y = nn.Dropout(self.dropout_ratio, deterministic=not train)(y)
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="conv_seg")(y)
