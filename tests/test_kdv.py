"""Third-order dispersive PDEs end-to-end — the workloads the order-3 Taylor
plan exists for (VERDICT round-1 item 6).  The reference's nested ``D``
composes to any order (``model_torch.py:174-178``); here third-order taps run
on the planned fast path (see tests/test_taylor_plan.py for differential
equality with the nested-jvp fallback, and BENCHMARKS.md for the measured
speedup)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pydens_tpu import Solver, D, NumpySampler as NS


@pytest.mark.slow
def test_airy_dispersion_converges_to_analytic():
    # u_t + u_xxx = 0 with u = sin(pi x + pi^3 t): an exact traveling
    # dispersive wave (periodic in x, IC bound by the time-gate ansatz).
    W = np.pi

    def airy(f, x, t):
        return D(f, t) + D(D(D(f, x), x), x)

    solver = Solver(airy, ndims=2, domain=[(0, 2), (0, 0.05)], periodic=(0,),
                    initial_condition=lambda x: jnp.sin(W * x),
                    layout="fafaf", features=[20, 20, 1], activation="Tanh",
                    seed=0)
    assert solver._plan_ok and (0, 0, 0) in solver._plan_derivs
    sampler = NS("u", low=0, high=2, seed=0) & NS("u", low=0, high=0.05,
                                                  seed=1)
    solver.fit(niters=2500, batch_size=512, lr=0.01, sampler=sampler,
               progress=False)
    assert np.mean(solver.losses[-20:]) < 0.5
    xs = np.linspace(0, 2, 41)
    for tt in (0.02, 0.04):
        pred = solver.predict(xs, np.full_like(xs, tt)).ravel()
        true = np.sin(W * xs + W ** 3 * tt)
        assert np.max(np.abs(pred - true)) < 0.05, f"t={tt}"


@pytest.mark.slow
def test_kdv_soliton_converges():
    # True nonlinear KdV: u_t + 6 u u_x + u_xxx = 0; the c=4 soliton
    # u = 2 sech^2(x - 4t + 2) travels right at speed 4.
    def kdv(f, x, t):
        return D(f, t) + 6 * f * D(f, x) + D(D(D(f, x), x), x)

    ic = lambda x: 2.0 / jnp.cosh(x + 2.0) ** 2
    solver = Solver(kdv, ndims=2, domain=[(-5, 5), (0, 0.5)],
                    initial_condition=ic, layout="fafaf",
                    features=[24, 24, 1], activation="Tanh", seed=0)
    assert solver._plan_ok and (0, 0, 0) in solver._plan_derivs
    sampler = NS("u", low=-5, high=5, seed=0) & NS("u", low=0, high=0.5,
                                                   seed=1)
    solver.fit(niters=3000, batch_size=1024, lr=0.005, sampler=sampler,
               progress=False)
    assert np.mean(solver.losses[-20:]) < 0.01
    xs = np.linspace(-5, 5, 81)
    for tt in (0.25, 0.5):
        pred = solver.predict(xs, np.full_like(xs, tt)).ravel()
        true = 2.0 / np.cosh(xs - 4 * tt + 2.0) ** 2
        assert np.max(np.abs(pred - true)) < 0.08, f"t={tt}"
