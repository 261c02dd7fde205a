"""Fourth-order (biharmonic/beam) PDEs end-to-end — the workloads the
order-4 Taylor plan exists for.  The reference's nested ``D`` composes to
any order (``model_torch.py:174-178``); here fourth-order taps run on the
planned fast path (see tests/test_taylor_plan.py for differential equality
with the nested-jvp fallback).

Fourth-order problems need four boundary conditions: the Dirichlet pair
comes from the ansatz (bc=0), the remaining derivative pair from
constraints on the forward closure (``fwd.grad`` — first-derivative
clamping or ``wrt=(0, 0)`` bending-moment conditions).
"""

import numpy as np
import pytest

import pydens_tpu as pdt
from pydens_tpu import Solver, D


def _beam_solver(seed=0):
    # Clamped uniform beam: u'''' = 384, u(0)=u(1)=0, u'(0)=u'(1)=0
    #   =>  u = 16 x^2 (1-x)^2  (max deflection 1 at x=1/2).
    def beam(f, x):
        return (D(D(D(D(f, x), x), x), x) - 384.0) / 384.0

    left = np.array([0.0], np.float32)
    right = np.array([1.0], np.float32)

    def clamp_left(f, x):
        return f.grad(left, wrt=0)

    def clamp_right(f, x):
        return f.grad(right, wrt=0)

    return Solver(beam, ndims=1, boundary_condition=0, seed=seed,
                  layout="fa fa f", features=[24, 24, 1], activation="Tanh",
                  constraints=(clamp_left, clamp_right))


@pytest.mark.slow
def test_clamped_beam_converges_to_analytic():
    solver = _beam_solver()
    assert solver._plan_ok and (0, 0, 0, 0) in solver._plan_derivs
    lt = {"equation": 1.0, "constraint_0": 10.0, "constraint_1": 10.0}
    solver.fit(niters=2500, batch_size=512, lr=0.01, loss_terms=lt,
               progress=False)
    # Full-batch L-BFGS polish (measured: 0.032 -> 1.2e-4 max error).
    solver.fit(niters=200, batch_size=2048, optimizer="LBFGS",
               resample=False, loss_terms=lt, progress=False)
    xs = np.linspace(0, 1, 101)
    true = 16.0 * xs ** 2 * (1 - xs) ** 2
    err = np.max(np.abs(solver.predict(xs).ravel() - true))
    assert err < 0.005, err


@pytest.mark.slow
def test_simply_supported_beam_moment_bc():
    # u'''' = pi^4 sin(pi x), u(0)=u(1)=0 (ansatz), u''(0)=u''(1)=0
    # (bending moment, via the multi-index fwd.grad)  =>  u = sin(pi x).
    W = np.pi

    def beam(f, x):
        return (D(D(D(D(f, x), x), x), x)) / W ** 4 - pdt.sin(W * x)

    left = np.array([0.0], np.float32)
    right = np.array([1.0], np.float32)

    def moment_left(f, x):
        return f.grad(left, wrt=(0, 0))

    def moment_right(f, x):
        return f.grad(right, wrt=(0, 0))

    solver = Solver(beam, ndims=1, boundary_condition=0, seed=0,
                    layout="fa fa f", features=[24, 24, 1],
                    activation="Tanh",
                    constraints=(moment_left, moment_right))
    assert solver._plan_ok and (0, 0, 0, 0) in solver._plan_derivs
    lt = {"equation": 1.0, "constraint_0": 5.0, "constraint_1": 5.0}
    solver.fit(niters=2500, batch_size=512, lr=0.01, loss_terms=lt,
               progress=False)
    solver.fit(niters=200, batch_size=2048, optimizer="LBFGS",
               resample=False, loss_terms=lt, progress=False)
    xs = np.linspace(0, 1, 101)
    err = np.max(np.abs(solver.predict(xs).ravel() - np.sin(W * xs)))
    assert err < 0.01, err
