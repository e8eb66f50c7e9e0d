"""Shared building blocks for the model zoo (NHWC, flax.linen).

Replaces mmcv's ``ConvModule`` (conv → norm → act) with a TPU-friendly
equivalent.  Notes on norm semantics:

* ``BN`` vs ``SyncBN``: under global-view ``jit`` over a sharded batch, XLA
  computes batch statistics over the *global* batch, so plain BatchNorm is
  already synchronous — the two config types intentionally map to the same
  module.  (The reference needs ``nn.SyncBatchNorm`` + DDP wiring for the
  same effect, ``configs/config_finetune.py:2``.)  When running inside
  ``shard_map``/``pmap``, pass ``axis_name`` to psum the statistics.
* ``GN`` maps to GroupNorm (always sync, stateless) — useful for the key
  encoder where the reference uses shuffle-BN to avoid stat leakage.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def make_norm(
    norm_cfg: Optional[dict],
    name: str,
    *,
    axis_name: Optional[str] = None,
    scale_init=nn.initializers.ones,
) -> Optional[nn.Module]:
    """Build a norm layer from an mmseg-style norm_cfg dict."""
    if norm_cfg is None:
        return None
    kind = norm_cfg.get("type", "BN")
    if kind in ("BN", "SyncBN", "BN2d"):
        return nn.BatchNorm(
            use_running_average=None,  # threaded via __call__
            momentum=0.9,
            epsilon=1e-5,
            dtype=jnp.float32,
            axis_name=axis_name,
            scale_init=scale_init,
            name=name,
        )
    if kind == "GN":
        return nn.GroupNorm(
            num_groups=norm_cfg.get("num_groups", 32),
            epsilon=1e-5,
            dtype=jnp.float32,
            scale_init=scale_init,
            name=name,
        )
    raise ValueError(f"unsupported norm type {kind!r}")


class ConvModule(nn.Module):
    """conv → norm → activation, NHWC.

    Equivalent of mmcv ConvModule as used throughout the reference's heads
    and backbone (e.g. ``mmseg_/models/decode_heads/aspp_head.py:31-41``).
    Bias is omitted when a norm follows, matching the reference.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    norm_cfg: Optional[dict] = None
    act: Optional[Callable] = nn.relu
    padding: Optional[int] = None
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, *, train: bool = True, norm_frozen: bool = False):
        k = self.kernel_size
        if self.padding is not None:
            pad = [(self.padding, self.padding)] * 2
        else:
            # "same"-style padding for odd kernels with dilation
            p = (k - 1) // 2 * self.dilation
            pad = [(p, p)] * 2
        x = nn.Conv(
            self.features,
            (k, k),
            strides=(self.stride, self.stride),
            padding=pad,
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=self.norm_cfg is None,
            dtype=self.dtype,
            name="conv",
        )(x)
        norm = make_norm(self.norm_cfg, "norm", axis_name=self.axis_name)
        if norm is not None:
            if isinstance(norm, nn.BatchNorm):
                x = norm(x, use_running_average=(not train) or norm_frozen)
            else:
                x = norm(x)
        if self.act is not None:
            x = self.act(x)
        return x.astype(self.dtype)


class MLP(nn.Module):
    """fc → (optional BN) → relu → fc projector/predictor head.

    Covers the MoCo/BYOL projector and predictor shapes built in the
    reference at ``builder.py:404-429`` (BYOL inserts BatchNorm1d).
    """

    hidden: int
    out: int
    use_bn: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=jnp.float32,
                name="bn",
            )(x)
        x = nn.relu(x)
        x = nn.Dense(self.out, dtype=self.dtype, name="fc2")(x)
        return x.astype(self.dtype)


class ConvMLP(nn.Module):
    """1x1-conv → relu → 1x1-conv dense projection head.

    The ``contrast_conv`` / local-projector pattern
    (``mmseg_/models/decode_heads/aspp_head.py:93-97``,
    ``builder.py:204-213``) — a per-pixel MLP expressed as 1x1 convs,
    which XLA lowers to batched matmuls on the MXU.
    """

    hidden: int
    out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.hidden, (1, 1), dtype=self.dtype, name="conv1")(x)
        x = nn.relu(x)
        x = nn.Conv(self.out, (1, 1), dtype=self.dtype, name="conv2")(x)
        return x.astype(self.dtype)
