"""The TPU loop-unroll path (PYDENS_TPU_LOOP_UNROLL, solver._unrolled_fori)
must preserve the plain loop's semantics exactly: same iteration count, same
guard stop indices (converged_at / stopped_on_nan), and the same losses up
to float rounding (XLA refuses the 4x-inlined body differently, so results
may differ at ULP level — the docstring's stated contract).

The CPU suite otherwise always runs k=1 (backend default), so this is the
only CI coverage of the unrolled while-loop + tail + guard snapshot/replay
interaction (round-4 advisor finding).
"""

import numpy as np
import pytest

import pydens_tpu as pdt
from pydens_tpu import Solver, D


def _fit(monkeypatch, k, **fit_kwargs):
    monkeypatch.setenv("PYDENS_TPU_LOOP_UNROLL", str(k))

    def ode(f, x):
        return D(f, x) - np.pi * pdt.cos(np.pi * x)

    s = Solver(ode, ndims=1, boundary_condition=0.0, layout="fa f",
               units=[16, 1], seed=0)
    kwargs = dict(batch_size=64, lr=0.01, progress=False)
    kwargs.update(fit_kwargs)
    s.fit(**kwargs)
    return s


def test_unrolled_until_loss_matches_plain_loop(monkeypatch):
    # until_loss exercises the guard snapshot/replay with a stop index that
    # is not a multiple of the unroll factor or GUARD_BLOCK in general.
    runs = {k: _fit(monkeypatch, k, niters=5000, chunk_size=5000,
                    until_loss=5e-2) for k in (1, 4)}
    n1, n4 = (len(runs[k].losses) for k in (1, 4))
    assert 0 < n1 < 5000
    assert n1 == n4
    assert (runs[1].history[-1]["converged_at"]
            == runs[4].history[-1]["converged_at"])
    np.testing.assert_allclose(runs[1].losses, runs[4].losses,
                               rtol=1e-5, atol=0.0)


def test_unrolled_tail_and_divergence_guard(monkeypatch):
    # niters=37: 9 full unroll blocks + a 1-iteration tail through the
    # plain fori (no guard, so the pure _unrolled_fori path is exercised).
    runs = {k: _fit(monkeypatch, k, niters=37, chunk_size=37,
                    stop_on_nan=False) for k in (1, 4)}
    assert len(runs[1].losses) == len(runs[4].losses) == 37
    np.testing.assert_allclose(runs[1].losses, runs[4].losses,
                               rtol=1e-5, atol=0.0)

    # Divergence: both unroll factors must stop at the SAME iteration with
    # the partial history kept (snapshot/replay rewind inside an unrolled
    # block).
    stopped = {}
    for k in (1, 4):
        with pytest.warns(UserWarning, match="non-finite"):
            s = _fit(monkeypatch, k, niters=500, chunk_size=500,
                     optimizer="SGD", lr=1e10)
        rec = s.history[-1]
        assert "stopped_on_nan" in rec
        assert not np.isfinite(s.losses[-1])
        stopped[k] = (rec["stopped_on_nan"], len(s.losses))
    assert stopped[1] == stopped[4]
