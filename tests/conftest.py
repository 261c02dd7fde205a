"""Test environment: force the CPU backend with 8 virtual devices so the
data-parallel mesh path is exercised without TPU hardware (SURVEY §4).

Note: this image's sitecustomize imports jax at interpreter startup (to
register the TPU tunnel plugin), so setting JAX_PLATFORMS via os.environ here
is too late — use jax.config.update, which works any time before backend
initialization.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Opt-in persistent compilation cache: measured 3x on repeat compiles of the
# same configs (BENCHMARKS.md), but jax 0.9's CPU AOT loader logs
# machine-feature-mismatch errors (prefer-no-scatter/gather pseudo-features)
# and warns of possible SIGILL when reloading, so it stays off unless asked.
if os.environ.get("PYDENS_TPU_COMPILE_CACHE"):
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["PYDENS_TPU_COMPILE_CACHE"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
