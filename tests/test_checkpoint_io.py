"""Checkpoint persistence: save/restore roundtrip, latest link, metadata."""

import numpy as np
import jax
import jax.numpy as jnp

from cp2_tpu.checkpoint import (
    gc_checkpoints,
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
    wait_for_checkpoints,
)


def _state(seed):
    k = jax.random.PRNGKey(seed)
    return {
        "params": {"w": jax.random.normal(k, (4, 4)), "b": jnp.zeros((4,))},
        "queue": jax.random.normal(jax.random.fold_in(k, 1), (16, 4)),
        "step": jnp.asarray(7, jnp.int32),
    }


def test_save_restore_roundtrip(tmp_path):
    d = str(tmp_path / "ckpts")
    state = _state(0)
    path = save_checkpoint(d, 7, jax.device_get(state),
                           meta={"epoch": 3, "pretrain_type": "CP2"})
    template = jax.device_get(_state(1))  # different values, same structure
    restored, meta = restore_checkpoint(path, template)
    np.testing.assert_allclose(
        np.asarray(restored["params"]["w"]), np.asarray(state["params"]["w"])
    )
    np.testing.assert_allclose(np.asarray(restored["queue"]), np.asarray(state["queue"]))
    assert int(restored["step"]) == 7
    assert meta["epoch"] == 3 and meta["pretrain_type"] == "CP2"


def test_latest_link_tracks_newest(tmp_path):
    d = str(tmp_path / "ckpts")
    save_checkpoint(d, 10, jax.device_get(_state(0)))
    p2 = save_checkpoint(d, 20, jax.device_get(_state(1)))
    assert latest_checkpoint(d) == p2
    # fallback scan when the link file is removed
    import os

    os.remove(os.path.join(d, "latest"))
    assert latest_checkpoint(d) == p2


def test_latest_checkpoint_missing_dir():
    assert latest_checkpoint("/tmp/does-not-exist-cp2") is None


def test_async_save_roundtrip(tmp_path):
    d = str(tmp_path / "ckpts")
    state = jax.device_get(_state(0))
    path = save_checkpoint(d, 5, state, meta={"epoch": 1}, async_save=True)
    wait_for_checkpoints()
    restored, meta = restore_checkpoint(path, jax.device_get(_state(1)))
    np.testing.assert_allclose(
        np.asarray(restored["params"]["w"]), np.asarray(state["params"]["w"])
    )
    assert meta["epoch"] == 1


def test_latest_skips_uncommitted_link(tmp_path):
    """A 'latest' link ahead of the newest committed dir (interrupted async
    save) must fall back to the newest dir that actually has state."""
    import os

    d = str(tmp_path / "ckpts")
    p1 = save_checkpoint(d, 10, jax.device_get(_state(0)))
    with open(os.path.join(d, "latest"), "w") as f:
        f.write("20")  # points at a step that never finalized
    assert latest_checkpoint(d) == p1


def test_gc_checkpoints(tmp_path):
    d = str(tmp_path / "ckpts")
    for s in (10, 20, 30, 40, 50):
        save_checkpoint(d, s, jax.device_get(_state(0)))
    # keep_last=0 keeps everything (reference behavior)
    assert gc_checkpoints(d, 0) == []
    deleted = gc_checkpoints(d, 2, keep_every=30, protect=[20])
    assert deleted == [10]  # 30 by keep_every, 20 protected, 40/50 newest
    assert latest_checkpoint(d).endswith("/50")
    restored, _ = restore_checkpoint(
        latest_checkpoint(d), jax.device_get(_state(1))
    )
    assert int(restored["step"]) == 7  # payload intact after GC
