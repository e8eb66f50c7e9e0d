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
