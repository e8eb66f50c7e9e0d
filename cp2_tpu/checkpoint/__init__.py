"""Checkpointing: orbax persistence + the PretrainType conversion matrix."""

from cp2_tpu.checkpoint.io import (
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
from cp2_tpu.checkpoint.convert import (
    graft_params,
    load_pretrained_into_segmentor,
    torchvision_resnet_to_flax,
)

__all__ = [
    "latest_checkpoint",
    "restore_checkpoint",
    "save_checkpoint",
    "graft_params",
    "load_pretrained_into_segmentor",
    "torchvision_resnet_to_flax",
]
