"""Test configuration: force CPU with 8 virtual devices, enable x64.

Multi-chip sharding is exercised on a virtual CPU mesh
(xla_force_host_platform_device_count), the driver validates the same path
via __graft_entry__.dryrun_multichip.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the session may preset a TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The session may have pre-registered a TPU platform plugin that overrides
# JAX_PLATFORMS; the config update below wins regardless.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the suite's dominant cost is XLA
# recompilation of structurally identical programs across test files
# (fp64, 8 virtual devices). The cache turns every rerun — and every
# other process sharing it, e.g. a watching CI loop — into a cache hit.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
