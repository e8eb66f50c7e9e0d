"""U-Net backbone variants for the CP2 ablations.

The reference builds these from segmentation_models_pytorch
(``builder.py:76-137``): a ResNet-50 encoder with either
* no decoder (``UNET_ENCODER_ONLY``): project stage-4 features, OS=32; or
* a truncated decoder (``UNET_TRUNCATED``): run the first N U-Net decoder
  blocks (upsample + skip-concat + double conv) and project, e.g. N=2
  gives 128 channels at OS=8.

Here both are flax modules over our own ResNet encoder; the projector is
the same 1x1-conv MLP the reference attaches (builder.py:97-101,128-132).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from cp2_tpu.models.layers import ConvMLP
from cp2_tpu.models.registry import BACKBONES
from cp2_tpu.models.resnet import ResNet
from cp2_tpu.models.utils import UpConvBlock

Dtype = Any

DECODER_CHANNELS = (256, 128, 64, 32, 16)


@BACKBONES.register
class UNetEncoderOnly(nn.Module):
    """ResNet-50 encoder + dense projector on stage-4 features (OS=32)."""

    projector_dim: int = 128
    norm_cfg: Optional[dict] = None
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        feats = ResNet(
            depth=50,
            norm_cfg=self.norm_cfg or {"type": "BN"},
            dtype=self.dtype,
            axis_name=self.axis_name,
            name="backbone",
        )(x, train=train)
        return ConvMLP(feats[-1].shape[-1], self.projector_dim, dtype=self.dtype,
                       name="projector")(feats[-1])


@BACKBONES.register
class UNetTruncated(nn.Module):
    """ResNet-50 encoder + first N U-Net decoder blocks + dense projector."""

    projector_dim: int = 128
    num_decoder_blocks: int = 2
    norm_cfg: Optional[dict] = None
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        if self.num_decoder_blocks < 1:
            raise ValueError("num_decoder_blocks must be >= 1")
        feats = ResNet(
            depth=50,
            norm_cfg=self.norm_cfg or {"type": "BN"},
            dtype=self.dtype,
            axis_name=self.axis_name,
            name="backbone",
        )(x, train=train)
        # skips, deepest first: stage3 (OS=16), stage2 (OS=8), stage1 (OS=4)
        skips = [feats[2], feats[1], feats[0], None, None]
        y = feats[-1]
        for i in range(self.num_decoder_blocks):
            y = UpConvBlock(
                DECODER_CHANNELS[i],
                norm_cfg=self.norm_cfg or {"type": "BN"},
                dtype=self.dtype,
                name=f"decoder_{i}",
            )(y, skips[i], train=train)
        channels = DECODER_CHANNELS[self.num_decoder_blocks - 1]
        return ConvMLP(channels, self.projector_dim, dtype=self.dtype, name="projector")(y)
