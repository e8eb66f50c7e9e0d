"""The PretrainType checkpoint-conversion matrix.

Re-designs the reference's state-dict surgery
(networks/segment_network.py:63-162) as pure param-tree grafting:

* our own pretrain checkpoints (CP2/MOCO/BYOL/PROPOSED/DENSECL/PROPOSED_V2)
  store the SSLEncoder tree — the segmentor lives under ``encoder``;
  grafting drops ``conv_seg`` (class-count mismatch, reference :91) and can
  restrict to the backbone (``--use_backbone_only``, :84-92); a
  ``pretrain_type`` tag mismatch raises (:81-83).
* MIRROR checkpoints are segmentor trees already (:95-101).
* the *_IMGNET loaders ingest torch-format ResNet state dicts
  (torchvision layout, or MoCo-style ``module.encoder_q.`` prefixes) via
  ``torchvision_resnet_to_flax`` — covering the downloaded-baseline
  evaluation capability (SURVEY §2.5) without the external trainers.

Grafting returns a load report (loaded/skipped/missing) mirroring torch's
``load_state_dict(strict=False)`` output the reference prints (:92).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from cp2_tpu.types import PretrainType

OWN_PRETRAIN_TYPES = (
    PretrainType.CP2,
    PretrainType.MOCO,
    PretrainType.BYOL,
    PretrainType.PROPOSED,
    PretrainType.DENSECL,
    PretrainType.PROPOSED_V2,
)

IMGNET_BACKBONE_TYPES = (
    PretrainType.BYOL_IMGNET,
    PretrainType.CP2_IMGNET,
    PretrainType.VICEREGL_IMGNET,
    PretrainType.BARLOWTWINS_IMGNET,
    PretrainType.DINO_IMGNET,
    PretrainType.DENSECL_IMGNET,
)

MOCO_PREFIX_TYPES = (PretrainType.MOSREP_IMGNET, PretrainType.MOCO_IMGNET)
PIXPRO_TYPES = (
    PretrainType.PIXPRO,
    PretrainType.PIXPRO_IMGNET,
    PretrainType.CLOVE_IMGNET,
)


def _flatten(tree: Any, prefix: Tuple[str, ...] = ()) -> Dict[Tuple[str, ...], Any]:
    if isinstance(tree, dict):
        out = {}
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (str(k),)))
        return out
    return {prefix: tree}


def _unflatten(flat: Dict[Tuple[str, ...], Any]) -> Any:
    root: Dict[str, Any] = {}
    for path, leaf in flat.items():
        node = root
        for key in path[:-1]:
            node = node.setdefault(key, {})
        node[path[-1]] = leaf
    return root


def graft_params(
    target: Any,
    source: Any,
    *,
    drop_substrings: Tuple[str, ...] = (),
) -> Tuple[Any, Dict[str, List[str]]]:
    """Copy source leaves onto matching target paths (shape-checked).

    Returns (merged_tree, report) with report keys ``loaded`` /
    ``skipped_missing_in_target`` / ``shape_mismatch`` /
    ``missing_in_source`` / ``dropped``.
    """
    tflat = _flatten(target)
    sflat = _flatten(source)
    report: Dict[str, List[str]] = {
        "loaded": [],
        "skipped_missing_in_target": [],
        "shape_mismatch": [],
        "missing_in_source": [],
        "dropped": [],
    }
    merged = dict(tflat)
    for path, leaf in sflat.items():
        name = "/".join(path)
        if any(s in name for s in drop_substrings):
            report["dropped"].append(name)
            continue
        if path not in tflat:
            report["skipped_missing_in_target"].append(name)
            continue
        if tuple(np.shape(tflat[path])) != tuple(np.shape(leaf)):
            report["shape_mismatch"].append(name)
            continue
        tgt = tflat[path]
        dtype = getattr(tgt, "dtype", None)
        merged[path] = leaf if dtype is None else np.asarray(leaf).astype(dtype)
        report["loaded"].append(name)
    for path in tflat:
        if path not in sflat:
            report["missing_in_source"].append("/".join(path))
    return _unflatten(merged), report


def load_pretrained_into_segmentor(
    target_variables: Dict[str, Any],
    checkpoint_state: Dict[str, Any],
    checkpoint_meta: Dict[str, Any],
    pretrain_type: PretrainType,
    *,
    use_backbone_only: bool = False,
) -> Tuple[Dict[str, Any], Dict[str, List[str]]]:
    """Apply the PretrainType loading matrix to a finetune segmentor.

    ``target_variables``: {'params': ..., 'batch_stats': ...} of the
    freshly-initialized segmentor.  ``checkpoint_state``: the saved
    pretrain state dict (our orbax trees have ``params`` /
    ``batch_stats`` / ``ema_params`` / ...).
    """
    if pretrain_type in (PretrainType.RANDOM, PretrainType.NONE):
        # RANDOM keeps init; NONE = ImageNet init handled by the caller
        return target_variables, {"loaded": [], "dropped": []}

    if pretrain_type in OWN_PRETRAIN_TYPES:
        tagged = checkpoint_meta.get("pretrain_type")
        if tagged is not None and tagged != pretrain_type.name:
            raise ValueError(
                f"checkpoint pretrain_type {tagged!r} != requested {pretrain_type.name!r}"
            )
        out = dict(target_variables)
        report_all: Dict[str, List[str]] = {}
        for coll, src_coll in (("params", "params"), ("batch_stats", "batch_stats")):
            src = checkpoint_state.get(src_coll, {}).get("encoder", {})
            if use_backbone_only:
                src = {"backbone": src.get("backbone", {})}
            merged, report = graft_params(
                out.get(coll, {}), src, drop_substrings=("conv_seg",)
            )
            out[coll] = merged
            for k, v in report.items():
                report_all.setdefault(k, []).extend(v)
        return out, report_all

    if pretrain_type == PretrainType.MIRROR:
        out = dict(target_variables)
        report_all = {}
        for coll in ("params", "batch_stats"):
            src = checkpoint_state.get(coll, {})
            merged, report = graft_params(
                out.get(coll, {}), src, drop_substrings=("conv_seg",)
            )
            out[coll] = merged
            for k, v in report.items():
                report_all.setdefault(k, []).extend(v)
        return out, report_all

    if pretrain_type in IMGNET_BACKBONE_TYPES + MOCO_PREFIX_TYPES + PIXPRO_TYPES:
        # torch-format backbone state dicts from downloaded baselines
        prefix = None
        if pretrain_type in MOCO_PREFIX_TYPES:
            prefix = "module.encoder_q."
        elif pretrain_type in PIXPRO_TYPES:
            prefix = "module.encoder."
        bb_params, bb_stats = torchvision_resnet_to_flax(
            checkpoint_state, strip_prefix=prefix
        )
        out = dict(target_variables)
        out["params"] = dict(out["params"])
        merged_p, report = graft_params(
            out["params"].get("backbone", {}), bb_params
        )
        out["params"]["backbone"] = merged_p
        out["batch_stats"] = dict(out.get("batch_stats", {}))
        merged_s, _ = graft_params(out["batch_stats"].get("backbone", {}), bb_stats)
        out["batch_stats"]["backbone"] = merged_s
        return out, report

    raise NotImplementedError(f"{pretrain_type = }")


# ---------------------------------------------------------------------------
# torch → flax ResNet layout conversion
# ---------------------------------------------------------------------------

def torchvision_resnet_to_flax(
    state_dict: Dict[str, Any], *, strip_prefix: Optional[str] = None
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Convert a torchvision-layout ResNet state dict to our flax trees.

    Enables ImageNet initialization (the reference's default,
    builder.py:375-378: ``init_weights`` from ``torchvision://resnet50``)
    from a locally available torch checkpoint — conv kernels transpose
    OIHW→HWIO, BN splits into params (scale/bias) and batch_stats
    (mean/var).  Keys not matching the ResNet layout (fc.*, projector
    heads) are ignored.
    """
    params: Dict[Tuple[str, ...], Any] = {}
    stats: Dict[Tuple[str, ...], Any] = {}

    def put_conv(path: Tuple[str, ...], w):
        params[path + ("kernel",)] = np.transpose(np.asarray(w), (2, 3, 1, 0))

    def put_bn(path: Tuple[str, ...], key: str, w):
        w = np.asarray(w)
        if key == "weight":
            params[path + ("scale",)] = w
        elif key == "bias":
            params[path + ("bias",)] = w
        elif key == "running_mean":
            stats[path + ("mean",)] = w
        elif key == "running_var":
            stats[path + ("var",)] = w

    for raw_key, value in state_dict.items():
        key = raw_key
        if strip_prefix:
            if strip_prefix not in key:
                continue
            key = key.replace(strip_prefix, "", 1)
        # also tolerate the reference's own prefixes
        for pfx in ("backbone.", "module."):
            if key.startswith(pfx):
                key = key[len(pfx):]
        parts = key.split(".")
        if parts[0] == "conv1" and parts[-1] == "weight":
            put_conv(("conv1", "conv"), value)
        elif parts[0] == "bn1":
            put_bn(("conv1", "norm"), parts[-1], value)
        elif parts[0].startswith("layer") and len(parts) >= 3:
            stage = parts[0][len("layer"):]
            block = parts[1]
            mod = parts[2]
            base = (f"layer{stage}_{block}",)
            if mod in ("conv1", "conv2") and parts[-1] == "weight":
                put_conv(base + (mod, "conv"), value)
            elif mod == "conv3" and parts[-1] == "weight":
                put_conv(base + ("conv3",), value)
            elif mod in ("bn1", "bn2"):
                put_bn(base + (f"conv{mod[-1]}", "norm"), parts[-1], value)
            elif mod == "bn3":
                put_bn(base + ("norm3",), parts[-1], value)
            elif mod == "downsample":
                if parts[3] == "0" and parts[-1] == "weight":
                    put_conv(base + ("downsample", "conv"), value)
                elif parts[3] == "1":
                    put_bn(base + ("downsample", "norm"), parts[-1], value)
        # else: fc./projector/queue keys — intentionally ignored

    return _unflatten(params), _unflatten(stats)
