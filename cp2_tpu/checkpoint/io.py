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
import shutil
from typing import Any, Dict, List, Optional, Tuple

import orbax.checkpoint as ocp

META_NAME = "meta.json"

# shared async checkpointer: saves return once the host copy is snapshotted
# and the serialization/disk write continues in background threads.  One
# instance so wait_for_checkpoints() can fence every pending save.
_async_ckptr: Optional[ocp.AsyncCheckpointer] = None


def _get_async_checkpointer() -> ocp.AsyncCheckpointer:
    global _async_ckptr
    if _async_ckptr is None:
        _async_ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _async_ckptr


def wait_for_checkpoints() -> None:
    """Block until every pending async checkpoint save has committed."""
    if _async_ckptr is not None:
        _async_ckptr.wait_until_finished()


def save_checkpoint(
    directory: str,
    step: int,
    state: Any,
    meta: Optional[Dict[str, Any]] = None,
    *,
    keep_latest_link: bool = True,
    async_save: bool = False,
) -> str:
    """Save a pytree state under ``directory/step`` with metadata.

    With ``async_save`` the call returns as soon as the state is snapshotted;
    serialization and disk writes continue in background threads (orbax
    finalizes atomically — an interrupted save never appears at the final
    path).  Call :func:`wait_for_checkpoints` before reading the checkpoint
    back or exiting the process.

    Multi-host contract: EVERY process must call this (orbax's save runs a
    global ``sync_global_processes`` barrier; a rank-0-gated call deadlocks
    the pod — found by tests/test_multiprocess_finetune.py).  Only process
    0 writes the array data, ``meta.json``, and the ``latest`` link; a
    shared filesystem is assumed, like the reference's rank-0
    ``torch.save`` (main.py:661-670).
    """
    import jax

    directory = os.path.abspath(os.path.expanduser(directory))
    path = os.path.join(directory, str(step))
    if async_save:
        ckptr = _get_async_checkpointer()
        ckptr.save(os.path.join(path, "state"), args=ocp.args.StandardSave(state), force=True)
    else:
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.join(path, "state"), state, force=True)
        ckptr.wait_until_finished()
    if jax.process_index() == 0:
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, META_NAME), "w") as f:
            json.dump({"step": step, **(meta or {})}, f)
        if keep_latest_link:
            # reference copies the newest file to checkpoint.ckpt
            # (main.py:661-670)
            link = os.path.join(directory, "latest")
            tmp = link + ".tmp"
            with open(tmp, "w") as f:
                f.write(str(step))
            os.replace(tmp, link)
    return path


def gc_checkpoints(
    directory: str,
    keep_last: int,
    *,
    keep_every: int = 0,
    protect: Optional[List[int]] = None,
) -> List[int]:
    """Delete old step checkpoints, keeping the newest ``keep_last``.

    ``keep_every`` > 0 additionally protects every step divisible by it
    (periodic archival); ``protect`` pins explicit steps (e.g. the best-IoU
    checkpoint).  ``keep_last`` <= 0 keeps everything — the reference's
    behavior (it never deletes checkpoints).  Returns the deleted steps.
    """
    if keep_last <= 0:
        return []
    directory = os.path.abspath(os.path.expanduser(directory))
    if not os.path.isdir(directory):
        return []
    steps = sorted(int(d) for d in os.listdir(directory) if d.isdigit())
    keep = set(steps[-keep_last:])
    keep.update(s for s in steps if keep_every > 0 and s % keep_every == 0)
    keep.update(protect or [])
    deleted = []
    for s in steps:
        if s in keep:
            continue
        shutil.rmtree(os.path.join(directory, str(s)), ignore_errors=True)
        deleted.append(s)
    return deleted


def latest_checkpoint(directory: str) -> Optional[str]:
    directory = os.path.abspath(os.path.expanduser(directory))
    link = os.path.join(directory, "latest")
    if os.path.exists(link):
        with open(link) as f:
            path = os.path.join(directory, f.read().strip())
        # an async save interrupted before orbax finalized leaves the link
        # ahead of the newest committed dir; fall through to the scan then
        if os.path.isdir(os.path.join(path, "state")):
            return path
    if not os.path.isdir(directory):
        return None
    steps = sorted(
        (int(d) for d in os.listdir(directory)
         if d.isdigit() and os.path.isdir(os.path.join(directory, d, "state"))),
        reverse=True,
    )
    return os.path.join(directory, str(steps[0])) if steps else None


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
