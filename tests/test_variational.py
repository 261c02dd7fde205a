"""Deep Ritz variational formulation (``Solver(formulation='variational')``).

The equation callable returns an energy DENSITY whose Monte-Carlo mean is
minimized directly (E & Yu 2018) — a weak-form alternative to the
reference's strong-form residual training (``model_torch.py:396-410``
squares the residual; there is no variational mode to port).  The
exact-boundary ansatz supplies the admissible-set constraint, so no
boundary penalty is needed.
"""

import numpy as np
import pytest

import pydens_tpu as pdt
from pydens_tpu import Solver, D


def test_poisson_1d_deep_ritz():
    # E[u] = ∫ ½ u'² - π² sin(πx) u dx over u(0)=u(1)=0 → u = sin(πx),
    # E[u*] = -π²/4 · ∫ sin² = negative: the plain-mean (not squared)
    # reduction is observable in the loss sign.
    def energy(f, x):
        return 0.5 * D(f, x) ** 2 - np.pi ** 2 * pdt.sin(np.pi * x) * f

    solver = Solver(energy, ndims=1, seed=0, boundary_condition=0,
                    layout="fa fa f", features=[16, 16, 1],
                    activation="Tanh", formulation="variational")
    solver.fit(niters=3000, batch_size=256, lr=5e-3, progress=False)
    assert solver.losses[-1] < -1.0  # true minimum is -pi**2/4 ≈ -2.47
    xs = np.linspace(0, 1, 101)
    err = np.max(np.abs(solver.predict(xs).ravel() - np.sin(np.pi * xs)))
    assert err < 0.03, err


def test_poisson_2d_deep_ritz_first_order_plan():
    # Second-order PDE, but the energy uses only FIRST derivatives — the
    # Taylor plan carries order-1 taps only.
    def energy(f, x, y):
        src = 2 * np.pi ** 2 * pdt.sin(np.pi * x) * pdt.sin(np.pi * y)
        return 0.5 * (D(f, x) ** 2 + D(f, y) ** 2) - src * f

    solver = Solver(energy, ndims=2, seed=0, boundary_condition=0,
                    layout="fa fa f", features=[24, 24, 1],
                    activation="Tanh", formulation="variational")
    assert solver._plan_ok
    assert max(sum(d) for d in solver._plan_derivs) == 1
    solver.fit(niters=4000, batch_size=512, lr=5e-3, progress=False)
    g = np.linspace(0, 1, 21)
    X, Y = np.meshgrid(g, g, indexing="ij")
    pred = solver.predict(X.ravel(), Y.ravel()).ravel()
    truth = (np.sin(np.pi * X) * np.sin(np.pi * Y)).ravel()
    assert np.max(np.abs(pred - truth)) < 0.06


def test_variational_validation():
    with pytest.raises(ValueError, match="formulation"):
        Solver(lambda f, x: f, ndims=1, formulation="weak")

    def energy(f, x, t):
        return 0.5 * D(f, x) ** 2 - f

    solver = Solver(energy, ndims=2, seed=0, initial_condition=0.0,
                    formulation="variational", layout="fa f",
                    features=[8, 1])
    with pytest.raises(ValueError, match="variational"):
        solver.fit(batch_size=64, niters=10, adaptive=4, progress=False)
    with pytest.raises(ValueError, match="variational"):
        solver.fit(batch_size=64, niters=10, causal=1.0, progress=False)
