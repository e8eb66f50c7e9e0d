"""Tests for utils/profiling.py (StepTimer, HBM summary, NaN sweeps) and
the two config files no other test builds.

Reference analogs: Lightning profiler="simple" (finetune.py:47,234), the
shape/value assert web in builder.py (SURVEY §5 "Race detection").
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cp2_tpu import configs as _configs_pkg
from cp2_tpu.config import Config
from cp2_tpu.models import build_segmentor
from cp2_tpu.utils.profiling import (
    StepTimer,
    assert_finite,
    device_memory_summary,
    find_nonfinite,
)

CONFIG_DIR = os.path.dirname(_configs_pkg.__file__)


def test_step_timer_summary_stats():
    t = StepTimer()
    assert t.summary() == {}
    for _ in range(5):
        t.start()
        probe = jnp.ones((8,)) * 2.0
        t.stop(probe=probe)
    s = t.summary()
    assert s["steps"] == 5
    assert 0.0 < s["mean_s"] <= s["max_s"]
    assert s["p50_s"] <= s["p90_s"] <= s["max_s"]


def test_device_memory_summary_shape():
    out = device_memory_summary()
    # CPU backends may expose no memory_stats; when present, entries carry
    # the three fields with sane values
    for _, stats in out.items():
        assert set(stats) == {"bytes_in_use", "peak_bytes_in_use", "bytes_limit"}


def test_find_nonfinite_paths_and_assert():
    tree = {
        "ok": jnp.ones((3,)),
        "bad": {"w": jnp.asarray([1.0, np.nan]), "i": jnp.arange(3)},
        "inf": jnp.asarray([np.inf]),
    }
    bad = find_nonfinite(tree)
    assert any("bad" in p and "w" in p for p in bad)
    assert any("inf" in p for p in bad)
    assert not any(p.endswith("ok") for p in bad)
    with pytest.raises(FloatingPointError):
        assert_finite(tree, what="unit-test tree")
    assert_finite({"ok": jnp.zeros((2,))})  # clean tree passes


def test_find_nonfinite_ignores_int_leaves():
    # int leaves can't be non-finite and must not crash the sweep
    assert find_nonfinite({"i": jnp.arange(5), "b": jnp.asarray([True])}) == []


@pytest.mark.slow
def test_finetune_moco_config_builds_and_runs():
    # the 4th reference config file (configs/config_finetune_moco.py:1-35):
    # standard-stride ResNet-50 (OS 32) + ASPP classifier head
    cfg = Config.fromfile(os.path.join(CONFIG_DIR, "config_finetune_moco.py"))
    assert tuple(cfg.model.backbone.strides) == (1, 2, 2, 2)
    # num_classes is None in the file; the finetune CLI sets it at runtime
    # (reference finetune.py:201-207 does the same config mutation)
    cfg.model.decode_head.num_classes = 2
    model = build_segmentor(cfg)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    # OS 32 -> 2x2 spatial, num_classes channels
    assert out.shape == (1, 2, 2, cfg.model.decode_head.num_classes)


def test_example_iter_train_config_parses():
    # the documented tools/train.py example config must stay buildable
    cfg = Config.fromfile(os.path.join(CONFIG_DIR, "example_iter_train.py"))
    assert cfg.model.type == "EncoderDecoder"
    assert cfg.lr_config["policy"] == "poly"


def test_persistent_compilation_cache_writes(tmp_path):
    """enable_persistent_compilation_cache points JAX at an on-disk cache
    that actually receives entries (the train CLIs call this so sweep legs
    stop repaying identical fused-step compiles)."""
    from cp2_tpu.utils import enable_persistent_compilation_cache

    cache = str(tmp_path / "jax_cache")
    got = enable_persistent_compilation_cache(cache, min_compile_seconds=0)
    assert got == cache

    @jax.jit
    def f(x):
        return jnp.tanh(x) @ x.T

    try:
        f(jnp.ones((17, 5))).block_until_ready()
        assert os.listdir(cache), "no cache entries written"
    finally:
        # don't leave every later jit in the suite writing cache entries
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 3600)


def test_persistent_compilation_cache_env_disable(monkeypatch, tmp_path):
    from cp2_tpu.utils import enable_persistent_compilation_cache

    monkeypatch.setenv("CP2_JAX_CACHE_DIR", "")
    assert enable_persistent_compilation_cache() is None
    monkeypatch.setenv("CP2_JAX_CACHE_DIR", str(tmp_path / "envcache"))
    assert enable_persistent_compilation_cache() == str(tmp_path / "envcache")
