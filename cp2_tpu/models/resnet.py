"""ResNet backbone family (NHWC, flax.linen), mmseg-compatible config.

Re-designs the reference backbone (``mmseg_/models/backbones/resnet.py:308-688``)
for TPU:

* NHWC layout (XLA's preferred conv layout on TPU) instead of NCHW.
* per-stage ``strides`` / ``dilations`` exactly as the configs use them —
  OS=16 dilated variant ``strides=(1,2,2,1), dilations=(1,1,1,2)`` with
  ``contract_dilation`` (first block of a dilated stage halves its
  dilation), and the standard OS=32 variant.
* ``style='pytorch'``: the stride lives on the 3x3 conv of the bottleneck.
* ``with_cp`` maps to ``jax.checkpoint`` (rematerialisation) per block.
* ``norm_eval`` / ``frozen_stages`` are honored functionally: frozen stages
  use running BN stats; actually freezing the params is an optimizer mask
  (see ``frozen_param_labels``).
* ``init_cfg`` checkpoints are loaded outside the module by
  ``cp2_tpu.checkpoint.convert`` (pure param-tree surgery), not inside
  ``init_weights`` as the reference does.

Forward returns the tuple of stage features selected by ``out_indices``,
mirroring reference ``forward`` (resnet.py:632-647).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from cp2_tpu.models.layers import ConvModule, make_norm
from cp2_tpu.models.registry import BACKBONES

Dtype = Any

ARCH_SETTINGS = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
}


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False
    avg_down: bool = False
    norm_cfg: Optional[dict] = None
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True, norm_frozen: bool = False):
        identity = x
        kw = dict(norm_cfg=self.norm_cfg, dtype=self.dtype, axis_name=self.axis_name)
        out = ConvModule(
            self.planes, 3, stride=self.stride, dilation=self.dilation, name="conv1", **kw
        )(x, train=train, norm_frozen=norm_frozen)
        out = ConvModule(self.planes, 3, dilation=self.dilation, act=None, name="conv2", **kw)(
            out, train=train, norm_frozen=norm_frozen
        )
        if self.has_downsample:
            identity = _downsample(
                x, self.planes, self.stride, self.avg_down, self.norm_cfg,
                self.dtype, self.axis_name, train, norm_frozen,
            )
        return nn.relu(out + identity)


def _downsample(x, features, stride, avg_down, norm_cfg, dtype, axis_name, train, norm_frozen):
    """1x1 projection shortcut; ``avg_down`` pools before the 1x1 conv."""
    if avg_down and stride != 1:
        x = nn.avg_pool(x, (stride, stride), strides=(stride, stride))
        stride = 1
    return ConvModule(
        features, 1, stride=stride, act=None, norm_cfg=norm_cfg,
        dtype=dtype, axis_name=axis_name, name="downsample",
    )(x, train=train, norm_frozen=norm_frozen)


class Bottleneck(nn.Module):
    """1x1 reduce → 3x3 (stride/dilation) → 1x1 expand, expansion 4.

    ``zero_init_residual``: the last norm's scale starts at zero so each
    block begins as identity (reference resnet.py:600-630 semantics).
    """

    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False
    avg_down: bool = False
    norm_cfg: Optional[dict] = None
    zero_init_residual: bool = True
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True, norm_frozen: bool = False):
        identity = x
        kw = dict(norm_cfg=self.norm_cfg, dtype=self.dtype, axis_name=self.axis_name)
        out = ConvModule(self.planes, 1, name="conv1", **kw)(
            x, train=train, norm_frozen=norm_frozen
        )
        # 'pytorch' style: stride on the 3x3
        out = ConvModule(
            self.planes, 3, stride=self.stride, dilation=self.dilation, name="conv2", **kw
        )(out, train=train, norm_frozen=norm_frozen)
        out = nn.Conv(
            self.planes * 4, (1, 1), use_bias=False, dtype=self.dtype, name="conv3"
        )(out)
        norm3 = make_norm(
            self.norm_cfg,
            "norm3",
            axis_name=self.axis_name,
            scale_init=nn.initializers.zeros if self.zero_init_residual else nn.initializers.ones,
        )
        if isinstance(norm3, nn.BatchNorm):
            out = norm3(out, use_running_average=(not train) or norm_frozen)
        elif norm3 is not None:
            out = norm3(out)
        out = out.astype(self.dtype)
        if self.has_downsample:
            identity = _downsample(
                x, self.planes * 4, self.stride, self.avg_down, self.norm_cfg,
                self.dtype, self.axis_name, train, norm_frozen,
            )
        return nn.relu(out + identity)


@BACKBONES.register
class ResNet(nn.Module):
    """ResNet-{18,34,50,101,152} with mmseg-style stage configuration."""

    depth: int = 50
    in_channels: int = 3
    stem_channels: int = 64
    base_channels: int = 64
    num_stages: int = 4
    strides: Sequence[int] = (1, 2, 2, 2)
    dilations: Sequence[int] = (1, 1, 1, 1)
    out_indices: Sequence[int] = (0, 1, 2, 3)
    style: str = "pytorch"
    deep_stem: bool = False
    avg_down: bool = False
    frozen_stages: int = -1
    norm_cfg: Optional[dict] = None
    norm_eval: bool = False
    multi_grid: Optional[Sequence[int]] = None
    contract_dilation: bool = False
    with_cp: bool = False
    zero_init_residual: bool = True
    init_cfg: Optional[dict] = None
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, *, train: bool = True) -> Tuple[jax.Array, ...]:
        if self.depth not in ARCH_SETTINGS:
            raise KeyError(f"invalid depth {self.depth}")
        block_kind, stage_blocks = ARCH_SETTINGS[self.depth]
        stage_blocks = stage_blocks[: self.num_stages]
        expansion = 4 if block_kind == "bottleneck" else 1

        norm_frozen_stem = self.norm_eval or self.frozen_stages >= 0
        kw = dict(norm_cfg=self.norm_cfg, dtype=self.dtype, axis_name=self.axis_name)

        x = x.astype(self.dtype)
        if self.deep_stem:
            x = ConvModule(self.stem_channels // 2, 3, stride=2, name="stem1", **kw)(
                x, train=train, norm_frozen=norm_frozen_stem
            )
            x = ConvModule(self.stem_channels // 2, 3, name="stem2", **kw)(
                x, train=train, norm_frozen=norm_frozen_stem
            )
            x = ConvModule(self.stem_channels, 3, name="stem3", **kw)(
                x, train=train, norm_frozen=norm_frozen_stem
            )
        else:
            x = ConvModule(self.stem_channels, 7, stride=2, padding=3, name="conv1", **kw)(
                x, train=train, norm_frozen=norm_frozen_stem
            )
        # padding folded into reduce_window (-inf init ≡ the explicit -inf
        # pad, but skips materializing a 114² padded copy: 310us/step saved
        # in the CP2 step profile)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        outs = []
        for i, num_blocks in enumerate(stage_blocks):
            stride = self.strides[i]
            dilation = self.dilations[i]
            planes = self.base_channels * 2**i
            norm_frozen = self.norm_eval or (self.frozen_stages >= i + 1)
            for b in range(num_blocks):
                if self.multi_grid is not None and i == len(stage_blocks) - 1:
                    block_dilation = dilation * self.multi_grid[b]
                elif b == 0 and dilation > 1 and self.contract_dilation:
                    block_dilation = dilation // 2
                else:
                    block_dilation = dilation
                block_cls = Bottleneck if block_kind == "bottleneck" else BasicBlock
                if self.with_cp:
                    # rematerialize each residual block (reference with_cp
                    # uses torch checkpointing; jax.checkpoint is the native
                    # FLOPs-for-HBM trade on TPU)
                    block_cls = nn.remat(block_cls, static_argnums=(2, 3))
                extra = (
                    {"zero_init_residual": self.zero_init_residual}
                    if block_kind == "bottleneck"
                    else {}
                )
                block = block_cls(
                    planes=planes,
                    stride=stride if b == 0 else 1,
                    dilation=block_dilation,
                    has_downsample=(
                        b == 0 and (stride != 1 or x.shape[-1] != planes * expansion)
                    ),
                    avg_down=self.avg_down,
                    norm_cfg=self.norm_cfg,
                    dtype=self.dtype,
                    axis_name=self.axis_name,
                    name=f"layer{i + 1}_{b}",
                    **extra,
                )
                x = block(x, train, norm_frozen)
            if i in self.out_indices:
                outs.append(x)
        return tuple(outs)


def frozen_param_labels(params, frozen_stages: int) -> Any:
    """Label pytree for optax.multi_transform: 'frozen' for stem/early stages.

    Functional replacement for the reference's ``_freeze_stages``
    (resnet.py:532-599) and ``--linear_evaluation`` backbone freezing
    (finetune.py:219-222).
    """
    def label(path, _):
        name = "/".join(str(p.key) for p in path if hasattr(p, "key"))
        if frozen_stages >= 0 and ("conv1" in name.split("/")[0] or name.startswith("stem")):
            return "frozen"
        for stage in range(1, frozen_stages + 1):
            if name.startswith(f"layer{stage}_"):
                return "frozen"
        return "trainable"

    return jax.tree_util.tree_map_with_path(label, params)
