"""cp2_tpu — a TPU-native framework for dense contrastive pretraining.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the CP2
reference codebase (copy-paste contrastive pretraining + supervised
segmentation finetuning): MoCo-v2, BYOL, DenseCL, CP2 and pixel/region
correspondence variants, ResNet-50 + DeepLabV3 (ASPP) model zoo,
CutPaste/"mirror" pretext tasks, and the polyp/histology finetune stack.

Design principles (TPU-first, not a port):
  * pure-functional models (flax.linen) and train states; EMA encoders,
    negative queues and BN statistics are explicit state, not buffers.
  * SPMD via ``jax.sharding.Mesh`` + ``jit``; cross-device negatives ride
    XLA collectives over ICI instead of NCCL all_gather.
  * static shapes everywhere: masked arithmetic replaces boolean indexing.
  * augmentations are fused on-device kernels fed by a raw-image host
    pipeline; pixel-id correspondence is computed analytically from crop
    geometry instead of materializing id images.
"""

__version__ = "0.1.0"

from cp2_tpu import ops  # noqa: F401
