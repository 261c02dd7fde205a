"""Diagnostics: solver.residual() and grid-input predict."""

import numpy as np
import pytest

import pydens_tpu as pdt
from pydens_tpu import Solver, D, uniform_grid


def _ode(f, x):
    return D(f, x) - 2 * np.pi * pdt.cos(2 * np.pi * x)


def test_residual_drops_with_training():
    solver = Solver(_ode, ndims=1, initial_condition=.5, seed=0,
                    activation="Tanh", layout="fafaf", features=[12, 10, 1])
    xs = np.linspace(0, 1, 100)
    r0 = solver.residual(xs)
    assert r0.shape == (100, 1)
    solver.fit(niters=400, batch_size=256, lr=0.02, progress=False)
    r1 = solver.residual(xs)
    assert r1.mean() < r0.mean() * 0.1
    assert (r1 >= 0).all()


def test_residual_ensemble_mean():
    solver = Solver(_ode, ndims=1, seed=0, n_models=3)
    r = solver.residual(np.linspace(0, 1, 20))
    assert r.shape == (20, 1)
    assert np.isfinite(r).all()


def test_predict_accepts_stacked_grid():
    def pde(f, x, y):
        return D(D(f, x), x) + D(D(f, y), y)

    solver = Solver(pde, ndims=2, boundary_condition=0.5, seed=0)
    grid = uniform_grid([(0, 1), (0, 1)], 7)  # (49, 2)
    out = solver.predict(grid)
    assert out.shape == (49, 1)
    # equivalent to the per-column call
    out2 = solver.predict(grid[:, 0:1], grid[:, 1:2])
    np.testing.assert_allclose(out, out2, rtol=1e-6)


def test_predict_grad_matches_analytic():
    # train f ~ sin(2*pi*x) + 0.5; f' ~ 2*pi*cos(2*pi*x)
    solver = Solver(_ode, ndims=1, initial_condition=.5, seed=0,
                    activation="Tanh", layout="fafaf", features=[12, 10, 1])
    solver.fit(niters=500, batch_size=400, lr=0.02, progress=False)
    xs = np.linspace(0.05, 0.95, 50)
    g = solver.predict_grad(xs)
    assert g.shape == (50, 1)
    true = 2 * np.pi * np.cos(2 * np.pi * xs)
    assert np.max(np.abs(g.ravel() - true)) < 0.6  # |f'| scale ~6.3


def test_predict_grad_custom_model_fallback_path():
    import jax
    import jax.numpy as jnp
    from pydens_tpu import Model

    class Tiny(Model):
        def network_init(self, key):
            return {"w": jax.random.normal(key, (self.total, 1)) * 0.3}

        def network_apply(self, net, xs):
            return jnp.tanh(xs @ net["w"])

    solver = Solver(lambda f, x, y: D(f, x) + D(f, y), ndims=2, model=Tiny,
                    seed=0)
    g = solver.predict_grad(np.linspace(0, 1, 7), np.linspace(0, 1, 7))
    assert g.shape == (7, 2)
    assert np.isfinite(g).all()


def test_predict_grad_system_and_ensemble():
    def system(f, x):
        return (D(f[:, 0:1], x) - 1.0, D(f[:, 1:2], x) + 1.0)

    solver = Solver(system, ndims=1, seed=0, layout="fa f", features=[8, 2],
                    n_models=2)
    g = solver.predict_grad(np.linspace(0, 1, 5))
    assert g.shape == (5, 1, 2)
    assert np.isfinite(g).all()


def test_residual_and_grad_accept_stacked_grid():
    def pde(f, x, y):
        return D(D(f, x), x) + D(D(f, y), y)

    from pydens_tpu import uniform_grid
    solver = Solver(pde, ndims=2, boundary_condition=0.5, seed=0)
    grid = uniform_grid([(0, 1), (0, 1)], 6)  # (36, 2) stacked coordinates
    r = solver.residual(grid)
    assert r.shape == (36, 1)
    np.testing.assert_allclose(r, solver.residual(grid[:, 0:1],
                                                  grid[:, 1:2]), rtol=1e-6)
    g = solver.predict_grad(grid)
    assert g.shape == (36, 2)
    # wrong column count is a named error, not silent mangling
    with pytest.raises(ValueError, match="coordinate columns"):
        solver.residual(np.zeros(5))
    # ensembles too (this combination used to crash)
    s2 = Solver(pde, ndims=2, boundary_condition=0.5, seed=0, n_models=2)
    assert s2.residual(grid).shape == (36, 1)


def test_fit_zero_iters_noop():
    solver = Solver(_ode, ndims=1, seed=0)
    solver.fit(niters=0, batch_size=8, progress=False)
    assert solver.losses == [] and solver.history == []
