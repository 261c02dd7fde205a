"""Workload 12 — Euler–Bernoulli clamped beam (fourth-order/biharmonic):

    u'''' = q          on x in [0, 1]   (uniform load q = 384)
    u(0) = u(1) = 0    (Dirichlet, bound exactly by the ansatz)
    u'(0) = u'(1) = 0  (clamping, via fwd.grad constraints)

The exact deflection is ``u(x) = 16 x^2 (1 - x)^2`` (midspan deflection 1).
Fourth-order derivatives ride the Taylor-plan fast path: value + first +
second + third + fourth directional taps propagate through ONE network
traversal (order-4 Faà di Bruno chain rules — see
tests/test_taylor_plan.py for differential equality with nested jvp).  No
reference counterpart: the reference's tutorials stop at second order,
though its nested-``D`` API supports beams too (``model_torch.py:174-178``).
"""

import numpy as np

from pydens_tpu import Solver, D


def beam(f, x):
    # Normalize by the load so the residual is O(1) from the start.
    return (D(D(D(D(f, x), x), x), x) - 384.0) / 384.0


def main():
    left = np.array([0.0], np.float32)
    right = np.array([1.0], np.float32)
    solver = Solver(beam, ndims=1, boundary_condition=0, seed=0,
                    layout="fa fa f", features=[24, 24, 1],
                    activation="Tanh",
                    constraints=(lambda f, x: f.grad(left, wrt=0),
                                 lambda f, x: f.grad(right, wrt=0)))
    assert solver._plan_ok  # fourth-order taps are planned
    lt = {"equation": 1.0, "constraint_0": 10.0, "constraint_1": 10.0}
    solver.fit(niters=2500, batch_size=512, lr=0.01, loss_terms=lt)
    # Full-batch L-BFGS polish: Adam plateaus ~0.03 max error; L-BFGS
    # drives it to ~1e-4 (same two-phase recipe as the Neumann example).
    solver.fit(niters=200, batch_size=2048, optimizer="LBFGS",
               resample=False, loss_terms=lt)

    xs = np.linspace(0, 1, 101)
    true = 16.0 * xs ** 2 * (1 - xs) ** 2
    err = np.max(np.abs(solver.predict(xs).ravel() - true))
    print(f"max |approx - analytic deflection| = {err:.4f}")
    print(f"final loss: {solver.losses[-1]:.2e}")
    assert err < 0.005
    return solver


if __name__ == "__main__":
    main()
