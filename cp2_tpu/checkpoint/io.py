"""Orbax-backed checkpoint persistence.

Replaces the reference's two schemes (SURVEY §5): rank-0 ``torch.save`` of
{epoch, state_dict, optimizer, pretrain_type, backbone_type}
(main.py:528-550,661-670) and Lightning best-by-val-IoU checkpoints
(finetune.py:165-171).  Layout: ``<dir>/<step>/`` orbax pytree plus a
``meta.json`` carrying the same tags the reference embeds, so the
conversion matrix can assert ``pretrain_type`` compatibility
(segment_network.py:81-83).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import orbax.checkpoint as ocp

META_NAME = "meta.json"


def save_checkpoint(
    directory: str,
    step: int,
    state: Any,
    meta: Optional[Dict[str, Any]] = None,
    *,
    keep_latest_link: bool = True,
) -> str:
    """Save a pytree state under ``directory/step`` with metadata."""
    directory = os.path.abspath(os.path.expanduser(directory))
    path = os.path.join(directory, str(step))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(path, "state"), state, force=True)
    ckptr.wait_until_finished()
    with open(os.path.join(path, META_NAME), "w") as f:
        json.dump({"step": step, **(meta or {})}, f)
    if keep_latest_link:
        # reference copies the newest file to checkpoint.ckpt (main.py:661-670)
        link = os.path.join(directory, "latest")
        tmp = link + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(step))
        os.replace(tmp, link)
    return path


def latest_checkpoint(directory: str) -> Optional[str]:
    directory = os.path.abspath(os.path.expanduser(directory))
    link = os.path.join(directory, "latest")
    if os.path.exists(link):
        with open(link) as f:
            return os.path.join(directory, f.read().strip())
    if not os.path.isdir(directory):
        return None
    steps = [d for d in os.listdir(directory) if d.isdigit()]
    if not steps:
        return None
    return os.path.join(directory, str(max(int(s) for s in steps)))


def restore_checkpoint(path: str, target: Any) -> Tuple[Any, Dict[str, Any]]:
    """Restore a state pytree (shapes/dtypes from ``target``) + metadata."""
    path = os.path.abspath(os.path.expanduser(path))
    ckptr = ocp.StandardCheckpointer()
    state = ckptr.restore(os.path.join(path, "state"), target)
    meta: Dict[str, Any] = {}
    meta_path = os.path.join(path, META_NAME)
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return state, meta
