"""Systems of coupled equations (vector-valued solutions) — a superset of
the scalar-only reference: the network emits multiple components
(``features[-1] > 1``) and the equation returns a tuple of residuals."""

import numpy as np
import pytest

import pydens_tpu as pdt
from pydens_tpu import Solver, D


def test_harmonic_oscillator_system():
    # u' = v, v' = -omega^2 u with u(0)=0, v(0)=omega  =>  u = sin(omega x).
    # The vector initial condition [0, omega] is bound EXACTLY by the
    # ansatz (one value per component).
    omega = 2 * np.pi

    def system(f, x):
        u = f[:, 0:1]
        v = f[:, 1:2]
        return (D(u, x) - v, D(v, x) + omega ** 2 * u)

    solver = Solver(system, ndims=1, seed=0, activation="Tanh",
                    layout="fa fa f", features=[32, 32, 2],
                    initial_condition=lambda *a: np.array([0.0, omega]))
    solver.fit(niters=2000, batch_size=512, lr=0.01, progress=False)
    solver.fit(niters=150, batch_size=2048, optimizer="LBFGS",
               resample=False, progress=False)
    xs = np.linspace(0, 1, 100)
    pred = solver.predict(xs)
    assert pred.shape == (100, 2)
    # IC bound exactly
    np.testing.assert_allclose(solver.predict(0.0).ravel(), [0.0, omega],
                               atol=1e-4)
    u_err = np.max(np.abs(pred[:, 0] - np.sin(omega * xs)))
    v_err = np.max(np.abs(pred[:, 1] - omega * np.cos(omega * xs)))
    assert u_err < 0.15
    assert v_err < 0.15 * omega


def test_system_residual_diagnostic():
    def system(f, x):
        return (D(f[:, 0:1], x), D(f[:, 1:2], x) - 1.0)

    solver = Solver(system, ndims=1, seed=0, layout="fa f",
                    features=[8, 2])
    r = solver.residual(np.linspace(0, 1, 10))
    assert r.shape == (10, 1)
    assert np.isfinite(r).all()


def test_system_with_adaptive_and_ensemble():
    def system(f, x):
        return (D(f[:, 0:1], x) - 1.0, D(f[:, 1:2], x) + 1.0)

    solver = Solver(system, ndims=1, seed=0, layout="fa f",
                    features=[8, 2], n_models=2)
    solver.fit(niters=30, batch_size=64, adaptive=4, progress=False)
    assert np.isfinite(solver.losses).all()
