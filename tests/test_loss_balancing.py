"""Grad-norm loss balancing (fit(loss_balancing=...)): warmup-window
rebalancing must rescue mis-scaled multi-term losses without hurting
well-scaled ones.  The measured design rationale (clipping, warmup-only)
is in BENCHMARKS.md."""

import numpy as np
import pytest

from pydens_tpu import Solver, D

LEFT = np.array([0.0], np.float32)
RIGHT = np.array([1.0], np.float32)
CONS = (lambda f, x: f.grad(LEFT, wrt=0),
        lambda f, x: f.grad(RIGHT, wrt=0))
LT1 = {"equation": 1.0, "constraint_0": 1.0, "constraint_1": 1.0}
XS = np.linspace(0, 1, 101)
TRUE = 16.0 * XS ** 2 * (1 - XS) ** 2


def _beam_solver(equation):
    return Solver(equation, ndims=1, boundary_condition=0, seed=0,
                  layout="fa fa f", features=[24, 24, 1], activation="Tanh",
                  constraints=CONS)


@pytest.mark.slow
def test_balancing_rescues_misscaled_equation():
    # Unnormalized beam residual (O(384)): the equation gradient drowns the
    # clamping constraints at unit weights; balancing must recover them.
    def beam_raw(f, x):
        return D(D(D(D(f, x), x), x), x) - 384.0

    plain = _beam_solver(beam_raw)
    plain.fit(niters=2500, batch_size=512, lr=0.01, loss_terms=LT1,
              progress=False)
    err_plain = np.max(np.abs(plain.predict(XS).ravel() - TRUE))

    balanced = _beam_solver(beam_raw)
    balanced.fit(niters=2500, batch_size=512, lr=0.01, loss_terms=LT1,
                 loss_balancing=True, progress=False)
    err_bal = np.max(np.abs(balanced.predict(XS).ravel() - TRUE))

    assert err_plain > 0.05, err_plain   # the failure mode is real
    assert err_bal < 0.01, err_bal       # and balancing fixes it
    wts = balanced.history[-1]["balanced_weights"]
    assert wts[0] == 1.0 and min(wts[1:]) > 10.0, wts


@pytest.mark.slow
def test_balancing_harmless_on_well_scaled_equation():
    def beam(f, x):
        return (D(D(D(D(f, x), x), x), x) - 384.0) / 384.0

    balanced = _beam_solver(beam)
    balanced.fit(niters=2500, batch_size=512, lr=0.01, loss_terms=LT1,
                 loss_balancing=True, progress=False)
    err = np.max(np.abs(balanced.predict(XS).ravel() - TRUE))
    assert err < 0.02, err


def test_balancing_works_on_warm_solver():
    # The documented balance-then-continue flow: a solver with prior
    # training must still rebalance (the warmup window is fit-local, not
    # solver-lifetime — regression test for the global-step gate bug).
    def beam_raw(f, x):
        return D(D(D(D(f, x), x), x), x) - 384.0

    s = _beam_solver(beam_raw)
    s.fit(niters=1200, batch_size=256, lr=0.01, loss_terms=LT1,
          progress=False)  # warm, unbalanced
    s.fit(niters=300, batch_size=256, lr=0.01, loss_terms=LT1,
          loss_balancing=50, progress=False)
    wts = s.history[-1]["balanced_weights"]
    # The mis-scaled equation forces constraint weights far from 1.0; if
    # the warmup gate never fired, they would still be exactly 1.0.
    assert min(wts[1:]) > 5.0, wts


def test_balancing_validation():
    def ode(f, x):
        return D(f, x) - 1.0

    s = Solver(ode, ndims=1, seed=0)
    with pytest.raises(ValueError, match="at least two loss terms"):
        s.fit(niters=10, batch_size=16, loss_balancing=True, progress=False)

    s2 = _beam_solver(lambda f, x: D(D(D(D(f, x), x), x), x) - 384.0)
    with pytest.raises(ValueError, match="linesearch"):
        s2.fit(niters=10, batch_size=16, loss_terms=LT1, optimizer="LBFGS",
               resample=False, loss_balancing=True, progress=False)
    with pytest.raises(ValueError, match="positive"):
        s2.fit(niters=10, batch_size=16, loss_terms=LT1, loss_balancing=-5,
               progress=False)
