"""Multi-host bootstrap (``parallel.collectives.initialize``) tests.

Round-1 bug being guarded against: ``initialize()`` used to call
``jax.process_count()`` *before* ``jax.distributed.initialize`` — the query
initialised the backend, which silently turned the distributed bootstrap
into a no-op.  These tests run in fresh subprocesses (the conftest already
initialised this process's backend) and prove:

1. single-process: ``initialize()`` is a no-op that does NOT touch the
   backend (so a later real bootstrap would still be possible);
2. two processes: explicit coordinator args produce a genuine 2-process
   JAX runtime whose cross-host collectives work (reference capability:
   ``main.py:172-178`` + NCCL collectives).
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(code: str, timeout: int = 120, env_extra: dict | None = None):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # the parent test process exports this; a fresh CPU child must not
    # inherit multi-process markers
    for k in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS"):
        env.pop(k, None)
    if env_extra:
        env.update(env_extra)
    return subprocess.run(
        [sys.executable, "-c", textwrap.dedent(code)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=timeout,
    )


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_initialize_single_process_noop_before_backend():
    """No args + no cluster env => returns False and leaves the backend
    untouched (ordering property that round 1 violated)."""
    proc = _run("""
        import jax
        # env JAX_PLATFORMS=cpu is not authoritative when an accelerator
        # PJRT plugin is pre-registered (see conftest.py) — a down plugin
        # backend would hang this child at first backend touch
        jax.config.update("jax_platforms", "cpu")
        from jax._src import xla_bridge
        from cp2_tpu.parallel.collectives import initialize
        assert initialize() is False
        assert not xla_bridge._backends, "initialize() touched the backend"
        # the backend still works afterwards
        assert jax.device_count() >= 1
        print("OK")
    """)
    assert proc.returncode == 0, proc.stderr
    assert "OK" in proc.stdout


def test_initialize_surfaces_errors():
    """Bad explicit args must raise, not except-pass into a silent
    single-host run."""
    proc = _run("""
        import jax
        jax.config.update("jax_platforms", "cpu")
        from cp2_tpu.parallel.collectives import initialize
        try:
            initialize(coordinator_address="localhost:1",  # nothing listens
                       num_processes=2, process_id=1,
                       initialization_timeout=5)
        except Exception as e:
            print("RAISED", type(e).__name__)
        else:
            print("SILENT")
    """)
    # jax surfaces the failure either as a Python exception or (newer
    # versions) an abseil FATAL that kills the process — both are loud.
    # The forbidden outcome is a clean exit that silently fell back to a
    # single-host run.
    assert "SILENT" not in proc.stdout, (proc.stdout, proc.stderr)
    assert "RAISED" in proc.stdout or proc.returncode != 0, (
        proc.stdout, proc.stderr,
    )


@pytest.mark.slow
def test_initialize_two_process_collectives():
    port = _free_port()
    worker = """
        import sys
        import jax
        jax.config.update("jax_platforms", "cpu")
        from cp2_tpu.parallel.collectives import initialize, barrier
        pid = int(sys.argv[1]); port = sys.argv[2]
        assert initialize(coordinator_address=f"localhost:{port}",
                          num_processes=2, process_id=pid) is True
        assert jax.process_count() == 2
        assert jax.process_index() == pid
        # idempotent second call
        assert initialize() is True
        barrier()
        # a real cross-host collective: global psum over one device per host
        import jax.numpy as jnp
        from jax.experimental import multihost_utils
        total = multihost_utils.process_allgather(jnp.float32(pid + 1)).sum()
        assert float(total) == 3.0, float(total)
        print(f"WORKER{pid}_OK")
    """
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", textwrap.dedent(worker), str(pid), str(port)],
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True,
        )
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=180) for p in procs]
    for pid, (p, (out, err)) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{err}"
        assert f"WORKER{pid}_OK" in out
