"""The TPU loop-unroll path (PYDENS_TPU_LOOP_UNROLL, solver._unrolled_fori)
must preserve the plain loop's semantics exactly: same iteration count, same
guard stop indices (converged_at / stopped_on_nan), and the same losses up
to float rounding (XLA refuses the 4x-inlined body differently, so results
may differ at ULP level — the docstring's stated contract).

The CPU suite otherwise always runs k=1 (backend default), so this is the
only CI coverage of the unrolled while-loop + tail + guard snapshot/replay
interaction (round-4 advisor finding).

NOTE these assertions deliberately pin the CURRENT CPU XLA behavior, which
is tighter than the documented contract: on this jax build the k=1 and k=4
trajectories agree to rtol=1e-5 end-to-end, so the trajectory/stop-index
checks hold.  If a future XLA upgrade starts refusing the inlined body
differently, a 1-ULP divergence amplifies chaotically over thousands of
SGD steps and these tight checks will fail while the code behaves exactly
as documented — in that case loosen to: same iteration COUNT semantics,
trajectories compared only over the first ~50 iterations, and drop the
exact stop-index equality.
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


def test_regime_gate(monkeypatch):
    """The default unroll applies only in the tiny-step TPU regime: work
    (points x params x members) under _UNROLL_MAX_WORK and no
    linesearch/GN body; the env override is unconditional."""
    import jax
    from pydens_tpu import solver as sol

    monkeypatch.delenv("PYDENS_TPU_LOOP_UNROLL", raising=False)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert sol._loop_unroll(work=sol._UNROLL_MAX_WORK) == 4
    assert sol._loop_unroll(work=sol._UNROLL_MAX_WORK + 1) == 1
    assert sol._loop_unroll(work=100, big_body=True) == 1
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    assert sol._loop_unroll(work=100) == 1
    monkeypatch.setenv("PYDENS_TPU_LOOP_UNROLL", "4")
    assert sol._loop_unroll(work=10 ** 9, big_body=True) == 4


def test_gate_work_estimate_counts_adaptive_candidates(monkeypatch):
    """adaptive=r evaluates residuals on r x batch candidate points per
    iteration; the gate's work estimate must include the multiplier (a
    small nominal batch with a large r is NOT the tiny-step regime)."""
    from pydens_tpu import solver as sol

    seen = []
    real = sol._loop_unroll

    def spy(work=None, big_body=False):
        seen.append((work, big_body))
        return real(work=work, big_body=big_body)

    monkeypatch.setattr(sol, "_loop_unroll", spy)

    def ode(f, x):
        return D(f, x) - np.pi * pdt.cos(np.pi * x)

    s = Solver(ode, ndims=1, boundary_condition=0.0, layout="fa f",
               units=[16, 1], seed=0)
    s.fit(niters=2, batch_size=64, progress=False)
    s.fit(niters=2, batch_size=64, adaptive=8, progress=False)
    (w_plain, _), (w_adapt, _) = seen[-2:]
    assert w_adapt == 8 * w_plain


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
