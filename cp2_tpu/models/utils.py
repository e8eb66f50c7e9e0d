"""Model building-block utilities (mmseg ``models/utils`` parity).

Flax equivalents of the reference's utility modules
(``mmseg_/models/utils/``): ``SelfAttentionBlock``, ``DropPath``
(stochastic depth), ``SELayer``, ``InvertedResidual``, ``UpConvBlock``,
``make_divisible``, and a truncated-normal initializer.  ``ResLayer`` has
no standalone analog — stages are built inline by ``ResNet``.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from cp2_tpu.models.layers import ConvModule

Dtype = Any


def make_divisible(value: float, divisor: int = 8, min_value: Optional[int] = None,
                   min_ratio: float = 0.9) -> int:
    """Round channel counts to hardware-friendly multiples."""
    if min_value is None:
        min_value = divisor
    new_value = max(min_value, int(value + divisor / 2) // divisor * divisor)
    if new_value < min_ratio * value:
        new_value += divisor
    return new_value


def trunc_normal_init(stddev: float = 0.02):
    return nn.initializers.truncated_normal(stddev)


class DropPath(nn.Module):
    """Per-sample stochastic depth (reference utils/drop.py)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        if self.rate == 0.0 or not train:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


class SELayer(nn.Module):
    """Squeeze-and-Excitation channel gate (reference utils/se_layer.py)."""

    ratio: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        channels = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2))
        s = nn.Dense(make_divisible(channels / self.ratio), dtype=self.dtype,
                     name="fc1")(s)
        s = nn.relu(s)
        s = nn.Dense(channels, dtype=self.dtype, name="fc2")(s)
        s = nn.sigmoid(s)
        return x * s[:, None, None, :]


class InvertedResidual(nn.Module):
    """MobileNetV2-style inverted residual (reference utils/inverted_residual.py)."""

    out_channels: int
    stride: int = 1
    expand_ratio: int = 6
    norm_cfg: Optional[dict] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        in_channels = x.shape[-1]
        hidden = in_channels * self.expand_ratio
        use_res = self.stride == 1 and in_channels == self.out_channels
        kw = dict(norm_cfg=self.norm_cfg or {"type": "BN"}, dtype=self.dtype)
        y = x
        if self.expand_ratio != 1:
            y = ConvModule(hidden, 1, name="expand", **kw)(y, train=train)
        # depthwise 3x3
        y = nn.Conv(
            hidden, (3, 3), strides=(self.stride, self.stride),
            padding=[(1, 1), (1, 1)], feature_group_count=hidden,
            use_bias=False, dtype=self.dtype, name="dw_conv",
        )(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=jnp.float32, name="dw_bn")(y)
        y = nn.relu6(y).astype(self.dtype)
        y = ConvModule(self.out_channels, 1, act=None, name="project", **kw)(
            y, train=train
        )
        return x + y if use_res else y


class SelfAttentionBlock(nn.Module):
    """Generic key/query/value attention over feature maps
    (reference utils/self_attention_block.py).

    Query and key features may come from different maps; output is the
    value aggregation reshaped back to the query's spatial grid — one
    batched matmul pair on the MXU.
    """

    channels: int
    out_channels: int
    matmul_norm: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, query_feats, key_feats, *, train: bool = True):
        n, qh, qw, _ = query_feats.shape
        q = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="query_project")(
            query_feats
        ).reshape(n, qh * qw, self.channels)
        k = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="key_project")(
            key_feats
        ).reshape(n, -1, self.channels)
        v = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="value_project")(
            key_feats
        ).reshape(n, -1, self.channels)
        sim = jnp.einsum("nqc,nkc->nqk", q, k)
        if self.matmul_norm:
            sim = sim * (self.channels ** -0.5)
        attn = jax.nn.softmax(sim.astype(jnp.float32), axis=-1).astype(self.dtype)
        ctx = jnp.einsum("nqk,nkc->nqc", attn, v).reshape(n, qh, qw, self.channels)
        return nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="out_project")(
            ctx
        )


class Encoding(nn.Module):
    """Learned residual encoding layer (mmseg_/ops/encoding.py:6-72).

    Aggregates pixel features against K learned codewords with learned
    smoothing — softmax-weighted residual sums, all batched matmuls.
    """

    channels: int
    num_codes: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        n = x.shape[0]
        feats = x.reshape(n, -1, self.channels).astype(self.dtype)  # (N, P, C)
        std = 1.0 / ((self.num_codes * self.channels) ** 0.5)
        codewords = self.param(
            "codewords",
            lambda key, shape: jax.random.uniform(key, shape, minval=-std, maxval=std),
            (self.num_codes, self.channels),
        )
        # smoothing factors init U(-1, 0) (mmseg encoding.py semantics)
        scale = self.param(
            "scale",
            lambda key, shape: jax.random.uniform(key, shape, minval=-1.0, maxval=0.0),
            (self.num_codes,),
        )
        # residuals (N, P, K, C) realized as two matmul-shaped reductions
        dots = jnp.einsum("npc,kc->npk", feats, codewords)
        f_sq = jnp.sum(feats**2, axis=-1, keepdims=True)        # (N, P, 1)
        c_sq = jnp.sum(codewords**2, axis=-1)[None, None, :]    # (1, 1, K)
        dist = f_sq - 2.0 * dots + c_sq
        assign = jax.nn.softmax(scale[None, None, :] * dist, axis=2)
        # encoded[k] = sum_p a[p,k] * (x[p] - c[k])
        enc = jnp.einsum("npk,npc->nkc", assign, feats) - (
            jnp.sum(assign, axis=1)[..., None] * codewords[None]
        )
        return enc


class UpConvBlock(nn.Module):
    """Upsample + skip-concat + double conv (reference utils/up_conv_block.py);
    the building block of U-Net decoders (see also models/unet.py)."""

    features: int
    norm_cfg: Optional[dict] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip, *, train: bool = True):
        n, h, w, c = x.shape
        x = jax.image.resize(x, (n, h * 2, w * 2, c), method="nearest")
        if skip is not None:
            x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
        kw = dict(norm_cfg=self.norm_cfg or {"type": "BN"}, dtype=self.dtype)
        x = ConvModule(self.features, 3, name="conv1", **kw)(x, train=train)
        x = ConvModule(self.features, 3, name="conv2", **kw)(x, train=train)
        return x
