"""Tracing / profiling / numerical-debug utilities.

The reference's observability for these is thin (SURVEY §5: Lightning
``profiler="simple"`` behind --use_profiler, wall-clock meters, cudnn
determinism toggles).  TPU-native equivalents:

* ``trace`` — jax.profiler context writing a TensorBoard-loadable trace
  (device + host timelines, XLA op breakdown).
* ``StepTimer`` — wall-clock step statistics with p50/p90, accounting for
  async dispatch via block_until_ready on a probe leaf.
* ``device_memory_summary`` — live/peak HBM from jax device stats.
* ``assert_finite`` / ``find_nonfinite`` — NaN/Inf guards for state trees
  (the reference's closest analog is its shape/value assert web).
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Profile the enclosed block: ``with trace('/tmp/trace'): step()``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self):
        self.samples: List[float] = []
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, probe=None):
        if probe is not None:
            jax.block_until_ready(probe)
        self.samples.append(time.perf_counter() - self._t0)

    def summary(self) -> Dict[str, float]:
        if not self.samples:
            return {}
        arr = np.asarray(self.samples)
        return {
            "steps": len(arr),
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p90_s": float(np.percentile(arr, 90)),
            "max_s": float(arr.max()),
        }


def device_memory_summary() -> Dict[str, Any]:
    out = {}
    for d in jax.local_devices():
        try:
            stats = d.memory_stats()
        except Exception:
            continue
        if stats:
            out[str(d)] = {
                "bytes_in_use": stats.get("bytes_in_use"),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
                "bytes_limit": stats.get("bytes_limit"),
            }
    return out


def find_nonfinite(tree: Any, prefix: str = "") -> List[str]:
    """Paths of leaves containing NaN/Inf (host-side sweep)."""
    bad = []

    def visit(path, leaf):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            if not bool(jnp.all(jnp.isfinite(leaf))):
                name = "/".join(str(getattr(p, "key", p)) for p in path)
                bad.append(prefix + name)
        return leaf

    jax.tree_util.tree_map_with_path(visit, tree)
    return bad


def assert_finite(tree: Any, what: str = "state"):
    bad = find_nonfinite(tree)
    if bad:
        raise FloatingPointError(f"non-finite values in {what}: {bad[:10]}")
