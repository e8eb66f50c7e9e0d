"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding paths are exercised without TPU hardware by forcing the
host platform and splitting it into 8 virtual devices, mirroring how the
driver validates ``dryrun_multichip``.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (import after env is set)

jax.config.update("jax_threefry_partitionable", True)
