"""Fused on-device augmentations and the two-crop/background pipelines."""

from cp2_tpu.augment.pipeline import (
    AugmentConfig,
    FinetuneAugmentConfig,
    background_augment_batch,
    eval_augment_batch,
    finetune_augment_batch,
    lemon_augment_config,
    pretrain_batch_augment,
    two_crop_augment_batch,
)

__all__ = [
    "lemon_augment_config",
    "AugmentConfig",
    "FinetuneAugmentConfig",
    "background_augment_batch",
    "eval_augment_batch",
    "finetune_augment_batch",
    "pretrain_batch_augment",
    "two_crop_augment_batch",
]
