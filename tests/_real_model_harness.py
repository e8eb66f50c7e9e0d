"""REAL-model twin for full-architecture trajectory parity (SURVEY §7.3).

``_reference_harness`` drives the reference's loss code through a stub
conv encoder; this module supplies the missing piece VERDICT r3 names as
the top gap: a *real* (small) segmentor — dilated ResNet (BasicBlock) +
ASPP head with the contrast projector — implemented twice:

* a **torch** twin, hand-written here to the mmseg spec the reference
  trains (``mmseg_/models/backbones/resnet.py:308-688`` stage semantics:
  stride/dilation per stage, ``contract_dilation`` halving the first
  block's dilation; ``mmseg_/models/decode_heads/aspp_head.py:53-117``:
  image-pool branch + parallel atrous convs + bottleneck +
  ``contrast_conv`` 1x1 MLP), pluggable into the reference's
  ``builder.MODEL`` via the ``build_segmentor`` patch point;
* the rebuild's own ``cp2_tpu.models`` flax modules, configured
  identically, with the torch twin's exact weights injected.

Running the reference's ``forward_cp2`` + SGD around the torch twin and
our jitted pretrain step around the flax model for N steps on identical
data is therefore a full-model dynamics proof: deep BN stacks (batch-stat
training semantics, running-stat evolution, EMA-over-parameters-only),
the dilated stage-4, the ASPP projector, optimizer + queue interplay —
everything except the input pipeline.

Weight layout notes: torch conv ``(O, I, kh, kw)`` → flax ``(kh, kw, I,
O)``; BatchNorm2d(momentum=0.1) ≡ flax BatchNorm(momentum=0.9); torch
affine weight/bias → flax scale/bias; running mean/var → batch_stats.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def _t2n(t) -> np.ndarray:
    return t.detach().cpu().numpy().copy()


# ---------------------------------------------------------------------------
# torch twin modules (mirrors of cp2_tpu.models.{layers,resnet,heads})
# ---------------------------------------------------------------------------


def build_torch_modules():
    """Define the torch twin classes lazily (torch import stays optional)."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    class TConvModule(nn.Module):
        """conv → BN → (ReLU), the mmcv ConvModule contract our flax
        ``ConvModule`` rebuilds (bias-free conv when a norm follows)."""

        def __init__(self, cin, cout, k, stride=1, dilation=1, act=True,
                     padding=None):
            super().__init__()
            if padding is None:
                padding = (k - 1) // 2 * dilation
            self.conv = nn.Conv2d(cin, cout, k, stride, padding,
                                  dilation=dilation, bias=False)
            self.norm = nn.BatchNorm2d(cout)  # momentum 0.1 == flax 0.9
            self.act = act

        def forward(self, x):
            x = self.norm(self.conv(x))
            return F.relu(x) if self.act else x

    class TBasicBlock(nn.Module):
        """mmseg BasicBlock (resnet.py:13-94): 3x3(s,d) → 3x3(d) + skip."""

        expansion = 1

        def __init__(self, cin, planes, stride=1, dilation=1):
            super().__init__()
            self.conv1 = TConvModule(cin, planes, 3, stride, dilation)
            self.conv2 = TConvModule(planes, planes, 3, 1, dilation,
                                     act=False)
            self.downsample = (
                TConvModule(cin, planes, 1, stride, act=False)
                if stride != 1 or cin != planes
                else None
            )

        def forward(self, x):
            identity = self.downsample(x) if self.downsample else x
            return F.relu(self.conv2(self.conv1(x)) + identity)

    class TBottleneck(nn.Module):
        """mmseg Bottleneck (resnet.py:97-305), 'pytorch' style: the
        stride/dilation live on the 3x3 middle conv; expansion 4."""

        expansion = 4

        def __init__(self, cin, planes, stride=1, dilation=1):
            super().__init__()
            self.conv1 = TConvModule(cin, planes, 1)
            self.conv2 = TConvModule(planes, planes, 3, stride, dilation)
            self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
            self.norm3 = nn.BatchNorm2d(planes * 4)
            self.downsample = (
                TConvModule(cin, planes * 4, 1, stride, act=False)
                if stride != 1 or cin != planes * 4
                else None
            )

        def forward(self, x):
            identity = self.downsample(x) if self.downsample else x
            out = self.conv2(self.conv1(x))
            out = self.norm3(self.conv3(out))
            return F.relu(out + identity)

    class TResNet(nn.Module):
        """Tiny mmseg-config ResNet (BasicBlock depths), stage tuple out.

        Mirrors cp2_tpu.models.resnet.ResNet: 7x7/2 stem + 3x3/2 maxpool,
        per-stage strides/dilations, ``contract_dilation`` halving the
        first dilated block (mmseg resnet.py:408-415 semantics).
        """

        def __init__(self, stage_blocks=(2, 2, 2, 2), stem_channels=8,
                     base_channels=8, strides=(1, 2, 2, 1),
                     dilations=(1, 1, 1, 2), contract_dilation=True,
                     block="basic"):
            super().__init__()
            block_cls = TBottleneck if block == "bottleneck" else TBasicBlock
            self.conv1 = TConvModule(3, stem_channels, 7, 2, padding=3)
            cin = stem_channels
            self.stages = nn.ModuleList()
            for i, num_blocks in enumerate(stage_blocks):
                planes = base_channels * 2 ** i
                blocks = []
                for b in range(num_blocks):
                    if b == 0 and dilations[i] > 1 and contract_dilation:
                        d = dilations[i] // 2
                    else:
                        d = dilations[i]
                    blocks.append(block_cls(
                        cin, planes, stride=strides[i] if b == 0 else 1,
                        dilation=d,
                    ))
                    cin = planes * block_cls.expansion
                self.stages.append(nn.Sequential(*blocks))

        def forward(self, x):
            x = self.conv1(x)
            x = F.max_pool2d(x, 3, 2, 1)
            outs = []
            for stage in self.stages:
                x = stage(x)
                outs.append(x)
            return tuple(outs)

        def init_weights(self, *a, **k):
            pass

    class TASPPHead(nn.Module):
        """mmseg ASPPHead with the contrast branch (aspp_head.py:53-117):
        [image-pool 1x1] + [per-dilation convs] → concat → 3x3 bottleneck
        → contrast_conv (1x1 → ReLU → 1x1, bias on)."""

        def __init__(self, in_channels, channels, dilations, contrast_dim):
            super().__init__()
            self.image_pool = TConvModule(in_channels, channels, 1)
            self.branches = nn.ModuleList([
                TConvModule(in_channels, channels, 1 if d == 1 else 3,
                            dilation=d)
                for d in dilations
            ])
            self.bottleneck = TConvModule(
                channels * (len(dilations) + 1), channels, 3
            )
            self.contrast1 = nn.Conv2d(channels, channels, 1)
            self.contrast2 = nn.Conv2d(channels, contrast_dim, 1)

        def forward(self, x):
            n, _, h, w = x.shape
            pooled = self.image_pool(x.mean(dim=(2, 3), keepdim=True))
            ys = [pooled.expand(n, pooled.shape[1], h, w)]
            ys += [b(x) for b in self.branches]
            y = self.bottleneck(torch.cat(ys, dim=1))
            return self.contrast2(F.relu(self.contrast1(y)))

    class TSegmentor(nn.Module):
        """EncoderDecoder twin: the ``img_metas=None`` raw-forward hook the
        SSL layer uses (mmseg_/models/segmentors/encoder_decoder.py:137-145)."""

        def __init__(self, **kw):
            super().__init__()
            head_kw = {k: kw.pop(k) for k in
                       ("in_channels", "channels", "aspp_dilations",
                        "contrast_dim")}
            self.backbone = TResNet(**kw)
            self.decode_head = TASPPHead(
                head_kw["in_channels"], head_kw["channels"],
                head_kw["aspp_dilations"], head_kw["contrast_dim"],
            )

        def forward(self, img, img_metas=None, **kwargs):
            return self.decode_head(self.backbone(img)[-1])

    return TSegmentor


def make_real_segmentor_factory(seed: int, **segmentor_kwargs):
    """``build_segmentor``-compatible factory, deterministically seeded —
    the reference constructs encoder_q and encoder_k from two calls and
    then copies q→k params (builder.py:464-469), so per-call reseeding
    keeps the probe/copy semantics faithful while staying reproducible."""
    import torch

    TSegmentor = build_torch_modules()

    def build_segmentor(cfg, train_cfg=None, test_cfg=None):
        torch.manual_seed(seed)
        return TSegmentor(**segmentor_kwargs)

    return build_segmentor


# ---------------------------------------------------------------------------
# torch → flax extraction (matches cp2_tpu param-tree naming exactly)
# ---------------------------------------------------------------------------


def _conv_module_trees(m) -> Tuple[Dict, Dict]:
    params = {
        "conv": {"kernel": _t2n(m.conv.weight).transpose(2, 3, 1, 0)},
        "norm": {"scale": _t2n(m.norm.weight), "bias": _t2n(m.norm.bias)},
    }
    stats = {"norm": {"mean": _t2n(m.norm.running_mean),
                      "var": _t2n(m.norm.running_var)}}
    return params, stats


def _conv1x1_tree(conv) -> Dict[str, np.ndarray]:
    return {"kernel": _t2n(conv.weight).transpose(2, 3, 1, 0),
            "bias": _t2n(conv.bias)}


def extract_segmentor_trees(seg) -> Tuple[Dict, Dict]:
    """torch TSegmentor → (params, batch_stats) under the rebuild's keys:
    ``{"backbone": {"conv1", "layer{i}_{b}": ...}, "decode_head": ...}``."""
    params: Dict[str, Any] = {"backbone": {}, "decode_head": {}}
    stats: Dict[str, Any] = {"backbone": {}, "decode_head": {}}

    p, s = _conv_module_trees(seg.backbone.conv1)
    params["backbone"]["conv1"], stats["backbone"]["conv1"] = p, s
    for i, stage in enumerate(seg.backbone.stages):
        for b, block in enumerate(stage):
            key = f"layer{i + 1}_{b}"
            bp: Dict[str, Any] = {}
            bs: Dict[str, Any] = {}
            for name in ("conv1", "conv2"):
                bp[name], bs[name] = _conv_module_trees(getattr(block, name))
            if hasattr(block, "conv3"):  # Bottleneck: bare conv3 + norm3
                bp["conv3"] = {
                    "kernel": _t2n(block.conv3.weight).transpose(2, 3, 1, 0)
                }
                bp["norm3"] = {"scale": _t2n(block.norm3.weight),
                               "bias": _t2n(block.norm3.bias)}
                bs["norm3"] = {"mean": _t2n(block.norm3.running_mean),
                               "var": _t2n(block.norm3.running_var)}
            if block.downsample is not None:
                bp["downsample"], bs["downsample"] = _conv_module_trees(
                    block.downsample
                )
            params["backbone"][key], stats["backbone"][key] = bp, bs

    head = seg.decode_head
    for dst, src in (("image_pool", head.image_pool),
                     ("bottleneck", head.bottleneck)):
        params["decode_head"][dst], stats["decode_head"][dst] = (
            _conv_module_trees(src)
        )
    for i, branch in enumerate(head.branches):
        params["decode_head"][f"aspp_{i}"], stats["decode_head"][f"aspp_{i}"] = (
            _conv_module_trees(branch)
        )
    params["decode_head"]["contrast_conv"] = {
        "conv1": _conv1x1_tree(head.contrast1),
        "conv2": _conv1x1_tree(head.contrast2),
    }
    return params, stats


def graft_by_paths(init_tree, extracted) -> Any:
    """Rebuild ``init_tree`` with leaves from ``extracted``; key sets must
    match exactly so a naming drift fails loudly instead of silently
    training from a half-injected model."""
    import jax

    def flat(tree):
        return {
            jax.tree_util.keystr(path): leaf
            for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]
        }

    init_flat, ext_flat = flat(init_tree), flat(extracted)
    missing = sorted(set(init_flat) - set(ext_flat))
    extra = sorted(set(ext_flat) - set(init_flat))
    if missing or extra:
        raise KeyError(f"param-tree mismatch: missing={missing[:8]} "
                       f"extra={extra[:8]}")
    for key, leaf in init_flat.items():
        if tuple(np.shape(leaf)) != tuple(np.shape(ext_flat[key])):
            raise ValueError(
                f"shape mismatch at {key}: init {np.shape(leaf)} vs "
                f"extracted {np.shape(ext_flat[key])}"
            )
    treedef = jax.tree_util.tree_structure(init_tree)
    keys = [jax.tree_util.keystr(p)
            for p, _ in jax.tree_util.tree_flatten_with_path(init_tree)[0]]
    return jax.tree_util.tree_unflatten(
        treedef, [np.asarray(ext_flat[k], dtype=np.float32) for k in keys]
    )
