"""Driver-entry-point validation in a CLEAN subprocess.

The round-1 failure mode (VERDICT.md "What's weak" #1) was environmental:
``dryrun_multichip`` worked under the test suite (whose conftest provides
8 virtual devices via XLA_FLAGS) but crashed in the driver's fresh process,
because the entry point initialized the JAX backend before requesting
virtual CPU devices.  These tests reproduce the driver's environment — a
subprocess with NO inherited XLA_FLAGS / JAX_PLATFORMS — so the in-process
platform/device configuration inside ``__graft_entry__`` is what's tested.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _clean_env():
    env = dict(os.environ)
    # The driver does not set these; the conftest does. Strip them so the
    # subprocess exercises the entry point's own backend configuration.
    # PYTHONPATH is preserved (the image's sitecustomize lives there).
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    return env


def _run(code, timeout):
    return subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=_clean_env(),
        capture_output=True, text=True, timeout=timeout)


@pytest.mark.slow
def test_dryrun_multichip_clean_process():
    # The one driver-checked multi-chip deliverable: must pass from a fresh
    # interpreter with no test-suite environment (MULTICHIP gate).  No
    # platform pre-pinning here — dryrun_multichip itself must configure
    # the virtual-device CPU backend before anything initializes JAX.
    code = ("import __graft_entry__ as g\n"
            "g.dryrun_multichip(8)\n"
            "print('DRYRUN_OK')\n")
    proc = _run(code, timeout=560)
    if proc.returncode != 0:
        # One retry: on this box's single shared core the subprocess can be
        # starved/killed under full-suite load (observed flake; passes in
        # isolation).  The bug class this test guards — backend
        # initialization order in the entry point — fails DETERMINISTICALLY,
        # so a retry cannot mask it.
        first_err = proc.stderr[-2000:]
        proc = _run(code, timeout=560)
        assert proc.returncode == 0, (
            f"failed twice; first stderr:\n{first_err}\n---\nsecond "
            f"stderr:\n{proc.stderr[-4000:]}")
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "DRYRUN_OK" in proc.stdout


@pytest.mark.slow
def test_entry_compiles_clean_process():
    proc = _run(
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "import jax.numpy as jnp\n"
        "import __graft_entry__ as g\n"
        "fn, args = g.entry()\n"
        "out = jax.jit(fn)(*args)\n"
        "assert out.shape == (256, 1) and bool(jnp.isfinite(out).all())\n"
        "print('ENTRY_OK')\n",
        timeout=560)
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "ENTRY_OK" in proc.stdout
