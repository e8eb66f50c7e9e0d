"""Pallas TPU kernels for the hot dense-contrastive ops."""

from cp2_tpu.ops.pallas.dense_loss import dense_pair_loss, dense_pair_loss_reference

__all__ = ["dense_pair_loss", "dense_pair_loss_reference"]
