"""Checkpointing: orbax persistence + the PretrainType conversion matrix."""

from cp2_tpu.checkpoint.io import (
    gc_checkpoints,
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
    wait_for_checkpoints,
)
from cp2_tpu.checkpoint.convert import (
    graft_params,
    load_pretrained_into_segmentor,
    torchvision_resnet_to_flax,
)

__all__ = [
    "gc_checkpoints",
    "wait_for_checkpoints",
    "latest_checkpoint",
    "restore_checkpoint",
    "save_checkpoint",
    "graft_params",
    "load_pretrained_into_segmentor",
    "torchvision_resnet_to_flax",
]
