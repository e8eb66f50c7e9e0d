"""Import-and-drive harness for the UPSTREAM reference (/root/reference).

Used by ``test_reference_fidelity.py`` to run the reference's actual loss
code (``builder.py`` forwards) on CPU torch against the rebuilt JAX
objectives, on identical inputs, through an identical tiny deterministic
encoder.  The reference tree is treated strictly read-only; its missing GPU
stack (mmcv/mmseg, lightning, wandb, torchmetrics, smp, CUDA) is replaced
by in-memory stubs installed into ``sys.modules`` before import.

The encoder stub is the key trick: ``build_segmentor`` is patched to return
a single bias-free strided conv with weights drawn from a seeded numpy
generator; the JAX side wraps the SAME weights.  Both frameworks then
compute everything downstream — compositing, mask/id subsampling,
correspondence, normalization, dense + instance logits, queue, losses —
from their own code, so a float-tolerance match is a real fidelity proof
of the loss math (BN semantics are validated separately; the stub has no
normalization layers).
"""

from __future__ import annotations

import sys
import types
from typing import Any, Dict

import numpy as np

REFERENCE = "/root/reference"

_IMPORTED: Dict[str, Any] = {}

# wandb.log payloads captured by the stub (reference metrics that have no
# other observable channel). reset_wandb_capture() before a run, then read.
WANDB_LOGS: list = []


def reset_wandb_capture() -> None:
    WANDB_LOGS.clear()


def captured_wandb_metric(key: str):
    for payload in reversed(WANDB_LOGS):
        if key in payload:
            return payload[key]
    return None


def _install_stub_modules():
    import torch
    import torch.nn as nn

    def mod(name):
        m = types.ModuleType(name)
        # a real __file__ string keeps inspect.getmodule()'s sys.modules
        # scan (torch lazy custom-op registration) from tripping over us
        m.__file__ = f"<stub:{name}>"
        sys.modules[name] = m
        return m

    # ---- wandb: swallow everything, but capture log() payloads so the
    # fidelity tests can compare metrics the reference only exposes via
    # wandb (e.g. matching_positives_rate, builder.py:857-905) ------------
    if "wandb" not in sys.modules:
        wandb = mod("wandb")

        def _capture_log(payload=None, *a, **k):
            if isinstance(payload, dict):
                WANDB_LOGS.append(payload)

        wandb.log = _capture_log
        wandb.define_metric = lambda *a, **k: None
        wandb.Image = lambda *a, **k: None
        wandb.init = lambda *a, **k: None

    # ---- torchvision (only the rank-0 visualization paths touch it) ------
    if "torchvision" not in sys.modules:
        tv = mod("torchvision")
        tv_utils = mod("torchvision.utils")
        tv_utils.make_grid = lambda *a, **k: None
        tv.utils = tv_utils
        tv_tf = mod("torchvision.transforms")
        def _tf_getattr(name):
            if name.startswith("__"):  # keep inspect/import machinery sane
                raise AttributeError(name)
            return lambda *a, **k: None

        tv_tf.__getattr__ = _tf_getattr
        tv.transforms = tv_tf

    # ---- torchmetrics ---------------------------------------------------
    if "torchmetrics" not in sys.modules:
        class _Metric(nn.Module):
            def __init__(self, *a, **k):
                super().__init__()
                self._sum, self._n = 0.0, 0

            def forward(self, x, *a, **k):
                return self.update(x)

            def update(self, x, *a, **k):
                x = torch.as_tensor(x, dtype=torch.float32)
                self._sum += float(x.sum())
                self._n += x.numel()

            def compute(self):
                return torch.tensor(self._sum / max(self._n, 1))

            def reset(self):
                self._sum, self._n = 0.0, 0

        tm = mod("torchmetrics")
        for name in ("Accuracy", "Dice", "F1Score", "JaccardIndex",
                     "MetricCollection", "Precision", "Recall", "MeanMetric"):
            setattr(tm, name, _Metric)
        agg = mod("torchmetrics.aggregation")
        agg.MeanMetric = _Metric
        tm.aggregation = agg

    # ---- lightning -------------------------------------------------------
    if "lightning" not in sys.modules:
        li = mod("lightning")
        li.LightningModule = type("LightningModule", (nn.Module,), {})
        li.LightningDataModule = type("LightningDataModule", (), {})
        li.seed_everything = lambda *a, **k: None

    # ---- segmentation_models_pytorch --------------------------------------
    if "segmentation_models_pytorch" not in sys.modules:
        smp = mod("segmentation_models_pytorch")

        def _unet(*a, **k):
            raise NotImplementedError("smp.Unet not available in fidelity harness")

        smp.Unet = _unet

    # ---- mmseg (build_segmentor patched per-run) --------------------------
    if "mmseg" not in sys.modules:
        mmseg = mod("mmseg")
        models = mod("mmseg.models")
        models.build_segmentor = None  # set by run_* functions
        utils = mod("mmseg.models.utils")
        import torch.nn.functional as _F

        def resize(x, size=None, scale_factor=None, mode="nearest",
                   align_corners=None, warning=True):
            return _F.interpolate(x, size=size, scale_factor=scale_factor,
                                  mode=mode, align_corners=align_corners)

        utils.resize = resize
        heads = mod("mmseg.models.decode_heads")
        heads.FCNHead = type("FCNHead", (nn.Module,), {})
        models.utils = utils
        models.decode_heads = heads
        mmseg.models = models


def _patch_cuda_noops():
    """CPU-only torch: make the reference's hard .cuda() calls identities."""
    import torch

    if getattr(torch.Tensor.cuda, "_fidelity_patched", False):
        return
    orig = torch.Tensor.cuda

    def cuda(self, *a, **k):  # noqa: D401
        return self

    cuda._fidelity_patched = True
    torch.Tensor.cuda = cuda
    torch.nn.Module.cuda = lambda self, *a, **k: self


def _ensure_process_group():
    """world-size-1 gloo group so concat_all_gather/broadcast work
    (the reference's --debug mode does the same, main.py:724-729)."""
    import torch.distributed as dist

    if not dist.is_initialized():
        import os

        # per-process file rendezvous: a fixed TCP port collides when two
        # pytest processes (e.g. a full-suite run and a targeted run)
        # initialize concurrently
        dist.init_process_group(
            backend="gloo",
            init_method=f"file:///tmp/cp2_ref_pg_{os.getpid()}",
            world_size=1, rank=0,
        )


def import_reference_builder():
    """Import /root/reference/builder.py with stubs installed. Cached."""
    if "builder" in _IMPORTED:
        return _IMPORTED["builder"]
    _install_stub_modules()
    _patch_cuda_noops()
    _ensure_process_group()
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import builder  # noqa: F401  (the reference module)

    _IMPORTED["builder"] = builder
    return builder


# ---------------------------------------------------------------------------
# the shared deterministic encoder stub
# ---------------------------------------------------------------------------


def stub_conv_weights(seed: int, dim: int, stride: int) -> np.ndarray:
    """(dim, 3, stride, stride) OIHW float32, small scale."""
    r = np.random.RandomState(seed)
    return (r.randn(dim, 3, stride, stride) * 0.05).astype(np.float32)


def make_torch_stub_factory(dim: int, stride: int, seed: int,
                            backbone_channels: int = 2048,
                            backbone_stride: int = 32,
                            with_bn: bool = False):
    """Returns a ``build_segmentor(cfg, ...)``-compatible factory producing
    the deterministic conv stub (dense head + stage-4 backbone output).

    ``with_bn=True`` appends a ``BatchNorm2d(dim)`` to the dense path so the
    BN-semantics trajectory test can pin running-stat/EMA behavior — note
    the reference's MODEL __init__ probes ``encoder_q`` with random data in
    train mode (builder.py:392-402), so the query BN buffers are already
    non-trivial post-construction; callers must extract-and-inject them."""
    import torch
    import torch.nn as nn

    w_dense = stub_conv_weights(seed, dim, stride)
    w_backbone = stub_conv_weights(seed + 1, backbone_channels, backbone_stride)

    class StubBackbone(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv = nn.Conv2d(3, backbone_channels, backbone_stride,
                                  backbone_stride, bias=False)
            with torch.no_grad():
                self.conv.weight.copy_(torch.from_numpy(w_backbone))

        def forward(self, x):
            f = self.conv(x)
            return (f, f, f, f)

        def init_weights(self, *a, **k):
            pass

    class StubSegmentor(nn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = StubBackbone()
            self.dense_conv = nn.Conv2d(3, dim, stride, stride, bias=False)
            with torch.no_grad():
                self.dense_conv.weight.copy_(torch.from_numpy(w_dense))
            if with_bn:
                self.bn = nn.BatchNorm2d(dim)  # momentum 0.1, eps 1e-5

        def forward(self, img, img_metas=None, **kw):
            # mirrors the fork's img_metas=None hook
            # (mmseg_/models/segmentors/encoder_decoder.py:137-145)
            out = self.dense_conv(img)
            if with_bn:
                out = self.bn(out)
            return out

    def build_segmentor(cfg, train_cfg=None, test_cfg=None):
        return StubSegmentor()

    return build_segmentor


class _CfgShim:
    """Duck-types the mmengine Config the reference passes around."""

    model = None

    def get(self, *a, **k):
        return None


def build_reference_model(builder, *, dim: int, stride: int, seed: int,
                          queue_np: np.ndarray, queue2_np=None,
                          backbone_stride: int = 32, rank: int = 1,
                          stub_bn: bool = False,
                          segmentor_factory=None,
                          **model_kwargs):
    """Construct reference ``MODEL`` around the stub encoder with a pinned
    queue.  ``queue_np`` is (K, dim) row-major (the rebuild's layout); the
    reference stores (dim, K).  ``rank=0`` enables the reference's wandb
    metric paths (captured by the stub — see ``WANDB_LOGS``).
    ``segmentor_factory`` swaps the stub for a different
    ``build_segmentor`` (e.g. the REAL tiny segmentor twin in
    ``_real_model_harness``)."""
    import torch

    sys.modules["mmseg.models"].build_segmentor = (
        segmentor_factory
        if segmentor_factory is not None
        else make_torch_stub_factory(
            dim, stride, seed, backbone_stride=backbone_stride,
            with_bn=stub_bn,
        )
    )
    builder.build_segmentor = sys.modules["mmseg.models"].build_segmentor
    model = builder.MODEL(
        _CfgShim(),
        rank=rank,
        dim=dim,
        K=queue_np.shape[0],
        pretrain_from_scratch=True,
        **model_kwargs,
    )
    with torch.no_grad():
        model.queue.copy_(torch.from_numpy(queue_np.T.copy()))
        if queue2_np is not None:
            model.queue2.copy_(torch.from_numpy(queue2_np.T.copy()))
    return model


# ---------------------------------------------------------------------------
# torch -> flax weight extraction (for the DenseCL/MoCo/BYOL heads the
# reference constructs itself, builder.py:404-462 — the JAX twin injects
# these exact values so any disagreement is loss math, not init)
# ---------------------------------------------------------------------------


def _t2n(t) -> np.ndarray:
    return t.detach().cpu().numpy().copy()


def linear_params(linear) -> Dict[str, np.ndarray]:
    """torch Linear (out,in) -> flax Dense {kernel (in,out), bias}."""
    return {"kernel": _t2n(linear.weight).T, "bias": _t2n(linear.bias)}


def linear_params_chw_to_hwc(linear, c: int, h: int, w: int):
    """Linear over a FLATTENED feature map: torch flattens NCHW (c,h,w
    order), flax flattens NHWC (h,w,c) — permute the input axis."""
    W = _t2n(linear.weight)  # (out, c*h*w)
    W = W.reshape(W.shape[0], c, h, w).transpose(0, 2, 3, 1)
    return {"kernel": W.reshape(W.shape[0], -1).T, "bias": _t2n(linear.bias)}


def conv1x1_params(conv) -> Dict[str, np.ndarray]:
    """torch Conv2d (out,in,1,1) -> flax Conv {kernel (1,1,in,out), bias}."""
    return {
        "kernel": _t2n(conv.weight).transpose(2, 3, 1, 0),
        "bias": _t2n(conv.bias),
    }


def extract_projector_mlp(seq, *, chw=None) -> Dict[str, Any]:
    """Sequential(Linear, BN-or-Identity, ReLU, Linear) -> our MLP params."""
    import torch.nn as nn

    fc1 = (
        linear_params_chw_to_hwc(seq[0], *chw) if chw else linear_params(seq[0])
    )
    out: Dict[str, Any] = {"fc1": fc1, "fc2": linear_params(seq[3])}
    if isinstance(seq[1], nn.BatchNorm1d):
        out["bn"] = {"scale": _t2n(seq[1].weight), "bias": _t2n(seq[1].bias)}
    return out


def extract_densecl_neck(neck) -> Dict[str, Any]:
    """Reference DenseCLNeck (builder.py:179-274) -> our DenseCLNeck params."""
    return {
        "global_projector": {
            "fc1": linear_params(neck.global_projector[0]),
            "fc2": linear_params(neck.global_projector[2]),
        },
        "global_predictor": {
            "fc1": linear_params(neck.global_predictor[0]),
            "fc2": linear_params(neck.global_predictor[2]),
        },
        "local_projector": {
            "conv1": conv1x1_params(neck.local_projector[0]),
            "conv2": conv1x1_params(neck.local_projector[2]),
        },
        "local_predictor": {
            "conv1": conv1x1_params(neck.local_predictor[0]),
            "conv2": conv1x1_params(neck.local_predictor[2]),
        },
    }
