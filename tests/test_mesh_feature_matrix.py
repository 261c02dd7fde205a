"""Guard/feature matrix under the data-parallel mesh (round-4 verdict):
every training-loop feature that touches the carry or the loss must compute
THE SAME math sharded as on a single device — sharding never changes
values, so the full loss trajectory (and any stop index) must agree to f32
reduction-order noise.  This is the coverage for the guard snapshot/replay
holding sharded state: a wrong sharding on the snapshot would silently
replicate or stop at the wrong iteration, and only trajectory equality
catches it.
"""

import numpy as np
import pytest

import pydens_tpu as pdt
from pydens_tpu import Solver, D
from pydens_tpu.parallel import make_mesh


def _ode(f, x):
    return D(f, x) - 2 * np.pi * pdt.cos(2 * np.pi * x)


def _advection(f, x, t):
    return D(f, t) + 0.5 * D(f, x)


def _pair(equation, fit_kwargs, **solver_kwargs):
    """Run the same fit single-device and on the 8-device mesh; return both
    solvers."""
    runs = []
    for mesh in (None, make_mesh()):
        s = Solver(equation, seed=0, mesh=mesh, activation="Tanh",
                   layout="fa fa f", features=[16, 16, 1], **solver_kwargs)
        s.fit(progress=False, **fit_kwargs)
        runs.append(s)
    return runs


def _assert_trajectories_match(s1, s2, rtol=2e-4, atol=1e-6):
    assert len(s1.losses) == len(s2.losses)
    np.testing.assert_allclose(s1.losses, s2.losses, rtol=rtol, atol=atol)


def test_until_loss_stops_at_same_iteration_under_mesh():
    # The convergence guard's snapshot/replay rewinds a sharded carry; the
    # mesh run must stop at the SAME iteration with the same loss.
    s1, s2 = _pair(_ode, dict(niters=4000, batch_size=256, lr=0.02,
                              chunk_size=4000, until_loss=5e-2),
                   ndims=1, initial_condition=0.5)
    n = len(s1.losses)
    assert 0 < n < 4000, "want an early stop well inside the budget"
    assert s1.history[-1]["converged_at"] == s2.history[-1]["converged_at"]
    _assert_trajectories_match(s1, s2)
    assert s2.losses[-1] <= 5e-2


def test_divergence_guard_stops_at_same_iteration_under_mesh():
    # An IC must be bound: the equation-only loss sees the net solely
    # through D(f, x), so once a blown-up net saturates, every gradient
    # vanishes and the loss plateaus finite — the ansatz couples the net's
    # VALUE into the residual and lets SGD at lr=1e2 overflow mid-block
    # (a non-trivial guard snapshot/replay rewind).
    stops = []
    for mesh in (None, make_mesh()):
        s = Solver(_ode, ndims=1, seed=0, mesh=mesh, initial_condition=0.5)
        with pytest.warns(UserWarning, match="non-finite"):
            s.fit(niters=400, batch_size=64, chunk_size=400, optimizer="SGD",
                  lr=1e2, progress=False)
        stops.append((s.history[-1]["stopped_on_nan"], len(s.losses)))
    assert stops[0] == stops[1]
    assert stops[0][0] is not None and stops[0][1] < 400


def test_adaptive_matches_single_device():
    # Residual-ranked candidate selection must be batch-global under the
    # mesh (a per-shard top-k would pick different points).
    s1, s2 = _pair(_ode, dict(niters=60, batch_size=64, lr=0.02, adaptive=4),
                   ndims=1, initial_condition=0.5)
    _assert_trajectories_match(s1, s2)


def test_rba_matches_single_device():
    # Per-point attention weights ride the carry; they must track the same
    # fixed batch points shard-for-shard.
    s1, s2 = _pair(_advection, dict(niters=60, batch_size=64,
                                    resample=False, rba=True),
                   ndims=2, initial_condition=lambda x: pdt.sin(np.pi * x))
    _assert_trajectories_match(s1, s2)


def test_causal_matches_single_device():
    # Causal weighting sorts the batch by time and cumulates residual mass
    # — a per-shard cumsum would weight different prefixes.
    s1, s2 = _pair(_advection, dict(niters=60, batch_size=64, causal=5.0),
                   ndims=2, initial_condition=lambda x: pdt.sin(np.pi * x))
    _assert_trajectories_match(s1, s2)


def test_ntk_balancing_matches_single_device():
    # NTK-trace estimates (probe RNG keyed by iteration) and the EMA weight
    # state in the carry must agree across shardings.
    fit_kwargs = dict(niters=60, batch_size=64, loss_balancing=("ntk", 10),
                      loss_terms=["equation", "constraint_0"])
    s1, s2 = _pair(_ode, fit_kwargs, ndims=1, initial_condition=0.5,
                   constraints=lambda f, x: f(np.full(4, 0.25)) - 1.0)
    _assert_trajectories_match(s1, s2)
    w1 = s1.history[-1]["balanced_weights"]
    w2 = s2.history[-1]["balanced_weights"]
    np.testing.assert_allclose(np.asarray(w1, np.float64),
                               np.asarray(w2, np.float64), rtol=2e-4)
