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

import jax
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


class DilatedConv3x3(nn.Module):
    """3x3 dilated conv ('same' zero padding) as tap-decomposed matmuls.

    At ASPP's dilations the padded window dwarfs the feature grid — with
    a 14x14 grid and dilation 18, eight of nine taps read ONLY padding
    zeros, yet ``conv_general_dilated`` still burns MXU cycles on them
    (profiled: the ASPP branches dominated the CP2 step).  The same conv
    is exactly: a full-grid 1x1 matmul for the center tap, plus one
    matmul per off-center tap over just the rows/cols that stay
    in-bounds (statically known).  Taps whose valid region is empty
    vanish at trace time; output is bit-equivalent up to accumulation
    order.

    Parameter tree matches ``nn.Conv`` (``kernel`` of (3, 3, Cin, Cout)
    HWIO), so checkpoints and converters are unaffected.
    """

    features: int
    dilation: int
    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, cin, self.features),
            jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        x = x.astype(self.dtype)
        kernel = kernel.astype(self.dtype)
        n, h, w, _ = x.shape
        d = self.dilation
        out = jnp.dot(x, kernel[1, 1])  # center tap, full grid
        for ti, oy in enumerate((-d, 0, d)):
            for tj, ox in enumerate((-d, 0, d)):
                if oy == 0 and ox == 0:
                    continue
                y0, y1 = max(0, -oy), h - max(0, oy)
                x0, x1 = max(0, -ox), w - max(0, ox)
                if y1 <= y0 or x1 <= x0:
                    continue  # tap entirely out of bounds: contributes 0
                src = x[:, y0 + oy : y1 + oy, x0 + ox : x1 + ox, :]
                contrib = jnp.dot(src, kernel[ti, tj])
                out = out + jax.lax.pad(
                    contrib,
                    jnp.zeros((), contrib.dtype),
                    ((0, 0, 0), (y0, h - y1, 0), (x0, w - x1, 0), (0, 0, 0)),
                )
        if bias is not None:
            out = out + bias.astype(self.dtype)
        return out


class SpaceToDepthConv(nn.Module):
    """7x7 stride-2 stem conv as a 4x4 stride-1 conv on a space-to-depth input.

    The ResNet stem convolves a 3-channel image — on TPU the MXU runs at
    ~4% efficiency there (3 of 128 input lanes live) and XLA prepends a
    full-image layout copy (profiled: 16% of whole-mode inference, ~2% of
    the CP2 pretrain step).  Rewriting the input as 2x2-block
    space-to-depth ([H, W, C] → [H/2, W/2, 4C]) turns the same arithmetic
    into a 4x4 stride-1 conv over 4C channels: with pixel x[2p+t] and
    t+4 = 2m+v (m ∈ 0..3 kernel tap, v ∈ {0,1} block parity), the 7-tap
    window becomes 4 taps over parity-split channels, with one zero tap at
    t=-4 supplied by front-padding the kernel.  Exact up to accumulation
    order; padding ((2,1),(2,1)) reproduces the original zero padding 3.

    Parameter tree matches ``nn.Conv`` (``kernel`` of (7, 7, Cin, Cout)
    HWIO), so checkpoints and converters are unaffected.
    """

    features: int
    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (7, 7, cin, self.features),
            jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        x = x.astype(self.dtype)
        n, h, w, _ = x.shape
        # kernel tap t ∈ [-3, 3] → padded index t+4 = 2m+v; channel order of
        # the reshaped kernel is (v, w_parity, c), matching the input reshape
        k8 = jnp.pad(kernel.astype(self.dtype), ((1, 0), (1, 0), (0, 0), (0, 0)))
        k8 = k8.reshape(4, 2, 4, 2, cin, self.features)
        k8 = k8.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * cin, self.features)
        xs = x.reshape(n, h // 2, 2, w // 2, 2, cin)
        xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * cin)
        dn = jax.lax.conv_dimension_numbers(
            xs.shape, k8.shape, ("NHWC", "HWIO", "NHWC")
        )
        out = jax.lax.conv_general_dilated(
            xs, k8, (1, 1), ((2, 1), (2, 1)), dimension_numbers=dn
        )
        if bias is not None:
            out = out + bias.astype(self.dtype)
        return out


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
        # ASPP-style 3x3 convs whose dilation approaches the feature grid
        # mostly read padding zeros, yet XLA burns full 9-tap MXU cycles on
        # them.  Tap decomposition computes the center as a full-grid 1x1
        # matmul and each off-center tap only over its statically in-bounds
        # sliver (pad-reassembled).  Gate on the useful-FLOP fraction of the
        # padded conv: at 14x14, d=18 -> 0.11, d=12 -> 0.18, d=6 -> 0.51
        # (all measured faster decomposed: 1.25-1.27x fwd+bwd for the
        # partial cases, tools/bench_dilated_conv.py) while d=2 -> 0.82
        # (pad overhead beats the 18% FLOP saving — stays on the XLA conv).
        d = self.dilation
        if x.ndim == 4 and k == 3:
            fy = max(0, x.shape[1] - d) / x.shape[1]
            fx = max(0, x.shape[2] - d) / x.shape[2]
            useful_frac = (1 + 2 * fy + 2 * fx + 4 * fy * fx) / 9
        else:
            useful_frac = 1.0
        decompose = (
            k == 3
            and self.stride == 1
            and d > 1
            and self.padding in (None, d)
            and useful_frac <= 0.55
        )
        # thin-input stem convs (C=3): MXU efficiency ~4% plus a full-image
        # layout copy — the space-to-depth rewrite is exact (see
        # SpaceToDepthConv) and needs even spatial dims.  Inference-only:
        # measured +17.5% whole-mode serving throughput, but the training
        # step is ~1.7% slower (the input reshuffle + kernel-reshape wgrad
        # outweigh the forward saving once fwd+bwd share the HBM budget),
        # so the train path keeps the plain conv.  Both paths declare the
        # same conv/kernel (7,7,Cin,Cout) param.
        s2d = (
            not train
            and k == 7
            and self.stride == 2
            and d == 1
            and self.padding in (None, 3)
            and x.ndim == 4
            and x.shape[-1] <= 4
            and x.shape[1] % 2 == 0
            and x.shape[2] % 2 == 0
        )
        if s2d:
            x = SpaceToDepthConv(
                self.features,
                use_bias=self.norm_cfg is None,
                dtype=self.dtype,
                name="conv",
            )(x)
        elif decompose:
            x = DilatedConv3x3(
                self.features,
                self.dilation,
                use_bias=self.norm_cfg is None,
                dtype=self.dtype,
                name="conv",
            )(x)
        else:
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
