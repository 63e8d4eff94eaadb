"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding/DP tests use
XLA's host-platform device virtualization instead (same program, same
collectives, same shardings — just lowered to CPU).

Note: this environment pre-imports jax at interpreter startup (sitecustomize
in PYTHONPATH) with JAX_PLATFORMS=axon, so setting the env var here is too
late — jax.config.update is authoritative instead.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
