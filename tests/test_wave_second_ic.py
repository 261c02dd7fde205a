"""Second initial condition (u_t at t0) for wave-type equations — bound
exactly by the squared-gate ansatz (no reference counterpart)."""

import numpy as np
import pytest

import pydens_tpu as pdt
from pydens_tpu import Solver, D


def test_wave_converges_to_analytic():
    # u_tt = u_xx on [0,1]x[0,1], u(x,0)=sin(pi x), u_t(x,0)=0, u=0 at ends
    # =>  u = sin(pi x) cos(pi t).
    def wave(f, x, t):
        return D(D(f, t), t) - D(D(f, x), x)

    solver = Solver(wave, ndims=2,
                    initial_condition=lambda x: pdt.sin(np.pi * x),
                    initial_condition_t=0.0,
                    boundary_condition=0.0, layout="fa fa f",
                    features=[32, 32, 1], activation="Tanh", seed=0)
    assert solver._plan_ok  # wave is plannable
    solver.fit(niters=1500, batch_size=1024, lr=0.005, progress=False)
    solver.fit(niters=100, batch_size=2048, optimizer="LBFGS",
               resample=False, progress=False)

    # both ICs bound exactly
    xs = np.linspace(0, 1, 21)
    np.testing.assert_allclose(solver.predict(xs, 0.0).ravel(),
                               np.sin(np.pi * xs), atol=1e-5)
    g = solver.predict_grad(xs, np.zeros(21))
    np.testing.assert_allclose(g[:, 1], 0.0, atol=1e-4)  # u_t(x, 0) = 0

    # interior accuracy vs the analytic standing wave
    pts = np.random.default_rng(0).uniform(0.05, 0.95, size=(200, 2))
    pred = solver.predict(pts).ravel()
    true = np.sin(np.pi * pts[:, 0]) * np.cos(np.pi * pts[:, 1])
    assert np.max(np.abs(pred - true)) < 0.1


def test_ict_requires_ic():
    with pytest.raises(ValueError, match="requires"):
        Solver(lambda f, x, t: D(f, t), ndims=2, initial_condition_t=0.0,
               seed=0)


def test_ict_vector_for_systems():
    def system(f, x, t):
        u, v = f[:, 0:1], f[:, 1:2]
        return (D(D(u, t), t) - D(D(u, x), x), D(v, t))

    solver = Solver(system, ndims=2, seed=0, layout="fa f",
                    features=[8, 2],
                    initial_condition=np.array([0.0, 1.0]),
                    initial_condition_t=np.array([2.0, 0.0]))
    g = solver.predict_grad(np.linspace(0, 1, 5), np.zeros(5))
    # du/dt(t0) = 2, dv/dt(t0) = 0, exactly
    np.testing.assert_allclose(g[:, 1, 0], 2.0, atol=1e-5)
    np.testing.assert_allclose(g[:, 1, 1], 0.0, atol=1e-5)
