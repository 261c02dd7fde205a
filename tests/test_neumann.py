"""Neumann (derivative) boundary conditions, expressed as constraints on
the forward closure — demonstrating that D works inside constraints.

Problem:  u'' = 6x  on [0, 1],  u(0) = 0 (Dirichlet via constraint),
          u'(1) = 3 (Neumann)   =>   u = x^3.
"""

import numpy as np
import pytest

import pydens_tpu as pdt
from pydens_tpu import Solver, D


def test_neumann_bc_via_constraint():
    def ode(f, x):
        return D(D(f, x), x) - 6 * x

    boundary_left = np.array([0.0], np.float32)
    boundary_right = np.array([1.0], np.float32)

    def dirichlet(f, x):
        return f(boundary_left)            # u(0) = 0

    def neumann(f, x):
        return f.grad(boundary_right, wrt=0) - 3.0   # u'(1) = 3

    solver = Solver(ode, ndims=1, seed=0, activation="Tanh",
                    layout="fa fa f", features=[24, 24, 1],
                    constraints=(dirichlet, neumann))
    solver.fit(niters=2000, batch_size=512, lr=0.01,
               loss_terms={"equation": 1.0, "constraint_0": 20.0,
                           "constraint_1": 20.0}, progress=False)
    solver.fit(niters=150, batch_size=2048, optimizer="LBFGS",
               resample=False,
               loss_terms={"equation": 1.0, "constraint_0": 20.0,
                           "constraint_1": 20.0}, progress=False)

    xs = np.linspace(0, 1, 100)
    err = np.max(np.abs(solver.predict(xs).ravel() - xs ** 3))
    assert err < 0.05
    # Neumann condition approximately satisfied
    g = solver.predict_grad(np.array([1.0]))
    assert abs(float(g[0, 0]) - 3.0) < 0.15


def test_fwd_grad_accepts_numpy_int_and_multi_index():
    # wrt may be a numpy integer (e.g. drawn from np.arange) or a
    # multi-index tuple; u = x^3 has u'(1) = 3 and u''(1) = 6.
    def ode(f, x):
        return D(D(f, x), x) - 6 * x

    def probe(f, x):
        right = np.array([1.0], np.float32)
        d1 = f.grad(right, wrt=np.int64(0))          # u'(1) -> 3
        d2 = f.grad(right, wrt=(0, np.int32(0)))     # u''(1) -> 6
        return (d1 - 3.0) + (d2 - 6.0)

    solver = Solver(ode, ndims=1, seed=0, constraints=probe)
    solver.fit(niters=5, batch_size=16,
               loss_terms=["equation", "constraint_0"], progress=False)
    assert np.isfinite(solver.losses).all()
