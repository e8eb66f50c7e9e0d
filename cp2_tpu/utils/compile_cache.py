"""Persistent XLA compilation cache for the train/infer CLIs.

The fused train steps take minutes of trace+lower+compile on a slow host
core; every CLI invocation is its own process, so without a persistent
cache each finetune/pretrain leg of a sweep repays the full compile for
an identical program (the reference has no analog — torch eager pays no
compile, which is part of why its steady-state step is slower).  JAX's
persistent compilation cache keys on the lowered program + compile
options + topology, so identical shapes across processes hit.

Default location is ``~/.cache/cp2_tpu/jax`` (override with
``CP2_JAX_CACHE_DIR``; ``CP2_JAX_CACHE_DIR=""`` disables).  ``bench.py``
keeps its own repo-local cache for the driver's time-budget reasons.
"""

from __future__ import annotations

import os


def enable_persistent_compilation_cache(
    path: str | None = None, min_compile_seconds: float = 5.0
) -> str | None:
    """Point JAX at a persistent on-disk compile cache; returns the path
    (None if disabled or unsupported).  Safe to call more than once.
    Only compiles slower than ``min_compile_seconds`` are persisted."""
    import jax

    if path is None:
        path = os.environ.get("CP2_JAX_CACHE_DIR")
        if path == "":
            return None
        if path is None:
            path = os.path.join(
                os.path.expanduser("~"), ".cache", "cp2_tpu", "jax"
            )
    try:
        os.makedirs(path, exist_ok=True)
        changed = jax.config.jax_compilation_cache_dir != path
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", min_compile_seconds
        )
        if changed:
            # JAX materializes the cache singleton lazily at first use and
            # then ignores later jax_compilation_cache_dir updates; without
            # a reset, a second call with a different path (documented as
            # safe) would silently keep writing to the old directory.
            try:
                from jax._src import compilation_cache as _cc

                _cc.reset_cache()
            except Exception:
                pass
    except Exception:
        return None
    return path
