"""The ``PYDENS_TPU_COMPILE_CACHE`` env toggle (docs/api.md "Environment
toggles") must wire JAX's persistent compilation cache at the package
boundary — any entrypoint that imports ``pydens_tpu`` gets it, no harness
plumbing required.  Measured effect on the real TPU backend:
BENCHMARKS.md "Suite compile time / persistent compilation cache".
"""

import os
import subprocess
import sys

_PROBE = r"""
import jax
jax.config.update("jax_platforms", "cpu")
import pydens_tpu  # noqa: F401  (the import performs the wiring)
print("dir=", jax.config.jax_compilation_cache_dir)
print("min_secs=", jax.config.jax_persistent_cache_min_compile_time_secs)
"""


def _run(extra_env, remove=()):
    env = dict(os.environ, **extra_env)
    env.pop("JAX_PLATFORMS", None)  # the probe forces cpu in-process
    for name in remove:
        env.pop(name, None)
    return subprocess.run(
        [sys.executable, "-c", _PROBE], env=env, capture_output=True,
        text=True, timeout=120,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_env_toggle_wires_the_persistent_cache(tmp_path):
    cache_dir = str(tmp_path / "xla_cache")
    out = _run({"PYDENS_TPU_COMPILE_CACHE": cache_dir})
    assert out.returncode == 0, out.stderr[-2000:]
    assert f"dir= {cache_dir}" in out.stdout
    # Thresholds lowered so the suite's small executables actually cache.
    assert "min_secs= 0.2" in out.stdout


def test_cache_stays_off_by_default():
    out = _run({}, remove=("PYDENS_TPU_COMPILE_CACHE",))
    assert out.returncode == 0, out.stderr[-2000:]
    assert "dir= None" in out.stdout
