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
