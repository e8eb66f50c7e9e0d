"""Model zoo: registries, backbones, heads, necks, segmentors."""

from cp2_tpu.models.registry import (
    BACKBONES,
    HEADS,
    LOSSES,
    NECKS,
    SEGMENTORS,
    build_backbone,
    build_head,
    build_loss,
    build_neck,
    build_segmentor,
)
from cp2_tpu.models.resnet import ResNet, frozen_param_labels
from cp2_tpu.models.heads import ASPPHead, FCNHead
from cp2_tpu.models.necks import DenseCLNeck, GlobalProjector
from cp2_tpu.models.encoder_decoder import EncoderDecoder
from cp2_tpu.models.unet import UNetEncoderOnly, UNetTruncated
from cp2_tpu.models.vit import VisionTransformer
from cp2_tpu.ops import seg_losses as _seg_losses  # register LOSSES entries

__all__ = [
    "BACKBONES",
    "HEADS",
    "LOSSES",
    "NECKS",
    "SEGMENTORS",
    "build_backbone",
    "build_head",
    "build_loss",
    "build_neck",
    "build_segmentor",
    "ResNet",
    "frozen_param_labels",
    "ASPPHead",
    "FCNHead",
    "DenseCLNeck",
    "GlobalProjector",
    "EncoderDecoder",
]
