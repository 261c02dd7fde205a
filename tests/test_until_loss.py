"""fit(until_loss=tol): convergence-targeted training.

The compiled loop's device-side guard (the same while-loop predicate as the
divergence guard, solver.py run_chunk) exits at the first iteration whose
loss is <= tol; tol is a traced runtime scalar, so sweeping it reuses ONE
executable.  No reference counterpart (the reference's fit always runs its
full budget, model_torch.py:364-449) — this is the classical-solver
"train to tolerance" stopping rule.
"""

import jax.numpy as jnp
import numpy as np

import pydens_tpu as pdt
from pydens_tpu import Solver, D

TOL = 5e-2
BUDGET = 5000


def _solver():
    def ode(f, x):
        return D(f, x) - np.pi * pdt.cos(np.pi * x)

    return Solver(ode, ndims=1, boundary_condition=0.0, layout="fa f",
                  units=[16, 1], seed=0)


def test_until_loss_stops_early_then_reuses_the_compile():
    s = _solver()
    s.fit(niters=BUDGET, batch_size=64, chunk_size=BUDGET, lr=0.01,
          progress=False, until_loss=TOL)
    n1 = len(s.losses)
    # Converged well inside the budget, exactly at the first loss <= tol.
    assert 0 < n1 < BUDGET
    assert s.losses[-1] <= TOL
    assert all(l > TOL for l in s.losses[:-1])
    rec = s.history[-1]
    assert rec["converged_at"] == n1 - 1
    assert rec["niters"] == n1
    assert "stopped_on_nan" not in rec

    # An unreachable tol completes the full budget — and a DIFFERENT tol
    # (and no tol at all) reuses the same compiled executable: tol is a
    # runtime scalar, never a cache-key static.
    s.fit(niters=BUDGET, batch_size=64, chunk_size=BUDGET, lr=0.01,
          progress=False, until_loss=1e-30)
    assert len(s._step_cache) == 1
    assert len(s.losses) == n1 + BUDGET
    assert "converged_at" not in s.history[-1]

    s.fit(niters=BUDGET, batch_size=64, chunk_size=BUDGET, lr=0.01,
          progress=False)
    assert len(s._step_cache) == 1
    assert len(s.losses) == n1 + 2 * BUDGET


def test_until_loss_spans_chunks_and_counts_globally():
    # Convergence in a LATER chunk: converged_at is the solver-lifetime
    # iteration index (the same counter .losses indexes).
    s = _solver()
    s.fit(niters=BUDGET, batch_size=64, chunk_size=40, lr=0.01,
          progress=False, until_loss=TOL)
    n = len(s.losses)
    assert 40 < n < BUDGET, "want convergence after the first chunk"
    assert s.losses[-1] <= TOL
    assert s.history[-1]["converged_at"] == n - 1

    # The guard composes with the NaN guard (same predicate): a diverging
    # fit still stops with the non-finite loss recorded, not "converged".
    import pytest
    s2 = _solver()
    with pytest.warns(UserWarning, match="non-finite"):
        s2.fit(niters=500, batch_size=64, chunk_size=500, optimizer="SGD",
               lr=1e10, progress=False, until_loss=1e-8)
    assert "converged_at" not in s2.history[-1]
    assert "stopped_on_nan" in s2.history[-1]
    assert not np.isfinite(s2.losses[-1])


def test_until_loss_f32_rounding_classified_as_convergence():
    """Regression (round-3 advisor): when the f64 tol rounds UP in float32,
    a loss in (tol, float32(tol)] trips the device guard as converged —
    the host re-check must compare against the f32 value the device used,
    not the f64 original, or the stop is misclassified as divergence
    ('non-finite loss' warning with a finite loss, stopped_on_nan instead
    of converged_at)."""
    import warnings

    # A criterion pinning the loss to exactly float32(0.1); tol is an f64
    # just BELOW it that rounds back up to it in f32:
    #   loss == f32(tol)  -> device trips;  loss > tol (f64)  -> the old
    # host check saw "not converged" and warned about a non-finite loss.
    c32 = float(np.float32(0.1))
    tol = c32 - 1e-9
    assert float(np.float32(tol)) == c32 and tol < c32

    s = Solver(lambda f, x: D(f, x), ndims=1, seed=0,
               layout="fa f", features=[8, 1])
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any UserWarning -> test failure
        s.fit(niters=50, batch_size=16, progress=False, until_loss=tol,
              criterion=lambda pred, target: jnp.float32(0.1)
              + 0.0 * jnp.mean(jnp.square(pred - target)))
    rec = s.history[-1]
    assert rec["converged_at"] == 0, rec
    assert "stopped_on_nan" not in rec
    assert len(s.losses) == 1 and float(s.losses[-1]) == c32
