"""Callable (non-constant) Dirichlet boundary data and optax learning-rate
schedules — supersets of the reference (constant bc only; float lr only)."""

import numpy as np
import pytest

import pydens_tpu as pdt
from pydens_tpu import Solver, D


def test_callable_boundary_condition_binds_exactly():
    # Laplace equation with boundary data g(x, y) = x + y: the harmonic
    # extension is u = x + y itself.
    def pde(f, x, y):
        return D(D(f, x), x) + D(D(f, y), y)

    solver = Solver(pde, ndims=2, seed=0,
                    boundary_condition=lambda x, y: x + y,
                    layout="fafaf", features=[12, 12, 1], activation="Tanh")
    # boundary values exact at ANY parameters
    edge = np.linspace(0, 1, 9)
    np.testing.assert_allclose(solver.predict(np.zeros(9), edge).ravel(),
                               edge, atol=1e-5)
    np.testing.assert_allclose(solver.predict(edge, np.ones(9)).ravel(),
                               edge + 1, atol=1e-5)
    solver.fit(niters=300, batch_size=256, lr=0.01, progress=False)
    # interior converges to the harmonic solution x + y
    pts = np.random.default_rng(0).uniform(size=(100, 2))
    pred = solver.predict(pts).ravel()
    np.testing.assert_allclose(pred, pts.sum(axis=1), atol=0.05)


def test_callable_bc_plan_still_valid():
    def pde(f, x, y):
        return D(D(f, x), x) + D(D(f, y), y)

    solver = Solver(pde, ndims=2, seed=0,
                    boundary_condition=lambda x, y: pdt.sin(np.pi * x) * 0
                    + x * y)
    assert solver._plan_ok
    solver.fit(niters=20, batch_size=64, progress=False)
    assert np.isfinite(solver.losses).all()


def test_lr_schedule():
    import optax

    def ode(f, x):
        return D(f, x) - 2 * np.pi * pdt.cos(2 * np.pi * x)

    schedule = optax.cosine_decay_schedule(0.02, decay_steps=400)
    solver = Solver(ode, ndims=1, initial_condition=.5, seed=0,
                    activation="Tanh", layout="fafaf", features=[12, 10, 1])
    solver.fit(niters=400, batch_size=256, lr=schedule, progress=False)
    assert solver.losses[-1] < 5e-3
    assert solver.history[-1]["lr"] == "schedule" or isinstance(
        solver.history[-1]["lr"], str)
