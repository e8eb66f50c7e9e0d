"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding paths are exercised without TPU hardware by forcing the
CPU platform and splitting it into 8 virtual devices, mirroring how the
driver validates ``dryrun_multichip``.

Env vars (``JAX_PLATFORMS`` / ``XLA_FLAGS``) are NOT enough here: an
installed TPU plugin can take platform priority regardless, which in round 1
silently produced a 1-device backend and skipped the multi-device gate
tests.  ``jax.config.update`` before any backend touch is authoritative, so
that is what we use; a session-scoped fixture then *asserts* the mesh exists
so a mis-initialised backend fails the suite instead of skipping it.
"""

import os

# Belt (for any subprocesses the tests spawn) ...
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (import after env is set)

# ... and suspenders (authoritative for this process).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_threefry_partitionable", True)

import pytest  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def _require_8_device_cpu_mesh():
    """Gate: the suite is meaningless without the 8-device CPU backend.

    A skip here would silently disable the multi-device equivalence tests
    (round-1 failure mode), so mis-configuration is a hard error.
    """
    devices = jax.devices()
    assert devices[0].platform == "cpu", (
        f"test backend must be CPU, got {devices[0].platform!r} — "
        "jax was initialised before conftest could configure it"
    )
    assert len(devices) >= 8, (
        f"need >=8 virtual CPU devices for the multi-chip gate tests, "
        f"got {len(devices)}"
    )
