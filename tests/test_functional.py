"""Tests for the vector-calculus convenience operators and grid helpers."""

import numpy as np
import pytest

import pydens_tpu as pdt
from pydens_tpu import Solver, D, laplace, grad, div, hessian_diag, dn
from pydens_tpu import cart_prod, uniform_grid
from pydens_tpu.ops.tokens import Expr, EvalContext


def make_ctx(*cols):
    import jax.numpy as jnp
    leaves = [jnp.asarray(c, jnp.float32).reshape(-1, 1) for c in cols]
    ctx = EvalContext(leaves)
    coords = [Expr((lambda i: lambda ls: ls[i])(k), ctx, leaf_index=k)
              for k in range(len(leaves))]
    return ctx, coords


def test_laplace_matches_nested_D():
    x_vals = np.linspace(0.1, 1, 5)
    y_vals = np.linspace(0.2, 0.9, 5)
    ctx, (x, y) = make_ctx(x_vals, y_vals)
    f = Expr(lambda ls: ls[0] ** 3 + ls[1] ** 2, ctx)
    lap = laplace(f, x, y)
    np.testing.assert_allclose(np.asarray(lap.value).ravel(),
                               6 * x_vals + 2, rtol=1e-5)


def test_grad_and_div():
    x_vals = np.array([1.0, 2.0])
    y_vals = np.array([3.0, 4.0])
    ctx, (x, y) = make_ctx(x_vals, y_vals)
    f = Expr(lambda ls: ls[0] * ls[1], ctx)
    gx, gy = grad(f, x, y)
    np.testing.assert_allclose(np.asarray(gx.value).ravel(), y_vals)
    np.testing.assert_allclose(np.asarray(gy.value).ravel(), x_vals)
    d = div((f, f), x, y)
    np.testing.assert_allclose(np.asarray(d.value).ravel(), y_vals + x_vals)
    with pytest.raises(ValueError, match="one component per coordinate"):
        div((f,), x, y)


def test_hessian_diag_and_dn():
    x_vals = np.linspace(0.5, 1.5, 4)
    ctx, (x,) = make_ctx(x_vals)
    f = Expr(lambda ls: ls[0] ** 4, ctx)
    (d2,) = hessian_diag(f, x)
    np.testing.assert_allclose(np.asarray(d2.value).ravel(),
                               12 * x_vals ** 2, rtol=1e-5)
    d3 = dn(f, x, 3)
    np.testing.assert_allclose(np.asarray(d3.value).ravel(),
                               24 * x_vals, rtol=1e-5)


def test_laplace_in_solver():
    def pde(f, x, y):
        return laplace(f, x, y) - 5 * pdt.sin(np.pi * (x + y))

    solver = Solver(pde, ndims=2, boundary_condition=1, layout="fafaf",
                    features=[10, 10, 1], activation="Tanh", seed=0)
    solver.fit(niters=150, batch_size=256, lr=0.02, progress=False)
    assert solver.losses[-1] < solver.losses[0]


def test_cart_prod():
    pts = cart_prod(np.array([0, 1]), np.array([2, 3, 4]))
    assert pts.shape == (6, 2)
    np.testing.assert_allclose(pts[0], [0, 2])
    np.testing.assert_allclose(pts[-1], [1, 4])


def test_uniform_grid():
    g = uniform_grid([(0, 1), (-1, 1)], [3, 5])
    assert g.shape == (15, 2)
    assert g[:, 0].min() == 0 and g[:, 0].max() == 1
    assert g[:, 1].min() == -1 and g[:, 1].max() == 1
    g1 = uniform_grid((0, 2), 5)
    assert g1.shape == (5, 1)


def test_profile_dir_writes_trace(tmp_path):
    def ode(f, x):
        return D(f, x) - 1.0

    solver = Solver(ode, ndims=1, seed=0)
    solver.fit(niters=5, batch_size=16, progress=False,
               profile_dir=str(tmp_path))
    import os
    assert any(os.scandir(str(tmp_path)))  # trace files written
