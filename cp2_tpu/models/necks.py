"""Projection necks for the SSL variants.

* ``DenseCLNeck`` — parallel global (fc-relu-fc) and dense (1x1conv-relu-
  1x1conv) projectors with predictor twins, re-designing reference
  ``builder.py:179-274``.  Returns the same six named projections so the
  DenseCL / PROPOSED_V2 losses can select by ``use_predictor`` /
  ``use_avgpool_global`` exactly as the reference does (builder.py:700-758).
* ``GlobalProjector`` — the MoCo/BYOL flattened-feature projector built at
  reference ``builder.py:404-429``; the input dim is derived from the actual
  feature shape (fixing the reference's stride-squared size bug noted in
  SURVEY §3.3).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from cp2_tpu.models.layers import MLP, ConvMLP
from cp2_tpu.models.registry import NECKS

Dtype = Any


@NECKS.register
class DenseCLNeck(nn.Module):
    in_channels: int = 2048
    hid_channels: int = 2048
    out_channels: int = 128
    num_grid: int | None = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        # accept a backbone tuple (use last stage) or a single NHWC map
        if isinstance(x, (tuple, list)):
            x = x[-1]
        x = x.astype(self.dtype)

        x_global = jnp.mean(x, axis=(1, 2))  # (B, C)
        x_global_proj = MLP(
            self.hid_channels, self.out_channels, dtype=self.dtype, name="global_projector"
        )(x_global, train=train)
        x_global_pred = MLP(
            self.hid_channels, self.out_channels, dtype=self.dtype, name="global_predictor"
        )(x_global_proj, train=train)

        if self.num_grid is not None:
            # adaptive average pool to (num_grid, num_grid)
            n, h, w, c = x.shape
            x = x.reshape(n, self.num_grid, h // self.num_grid, self.num_grid, w // self.num_grid, c).mean((2, 4))

        x_local_proj = ConvMLP(
            self.hid_channels, self.out_channels, dtype=self.dtype, name="local_projector"
        )(x)
        x_local_pred = ConvMLP(
            self.hid_channels, self.out_channels, dtype=self.dtype, name="local_predictor"
        )(x_local_proj)

        return {
            "x_global_proj": x_global_proj,
            "x_global_pred": x_global_pred,
            "x_local_proj": x_local_proj,
            "x_local_pred": x_local_pred,
            "x_avgpool_local_proj": jnp.mean(x_local_proj, axis=(1, 2)),
            "x_avgpool_local_pred": jnp.mean(x_local_pred, axis=(1, 2)),
        }


@NECKS.register
class GlobalProjector(nn.Module):
    """Flatten the last backbone stage and project to the embedding dim."""

    hidden: int = 2048
    out: int = 256
    use_bn: bool = False  # BYOL uses BN in the MLP; MoCo does not
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, *, train: bool = True):
        x = feats[-1] if isinstance(feats, (tuple, list)) else feats
        x = x.astype(self.dtype).reshape(x.shape[0], -1)
        return MLP(self.hidden, self.out, use_bn=self.use_bn, dtype=self.dtype, name="mlp")(
            x, train=train
        )
