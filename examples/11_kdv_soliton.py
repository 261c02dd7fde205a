"""Workload 11 — Korteweg–de Vries soliton (third-order dispersion):

    u_t + 6 u u_x + u_xxx = 0   on x in [-5, 5], t in [0, 0.5]
    u(x, 0) = 2 sech^2(x + 2)

The exact solution is the right-traveling c=4 soliton
``u(x, t) = 2 sech^2(x - 4t + 2)``.  The third-order derivative rides the
Taylor-plan fast path (all taps in one network traversal — see
BENCHMARKS.md for the measured 1.57x over nested jvp).  No reference
counterpart: the reference's tutorials stop at second order, though its
nested-``D`` API supports this equation too (``model_torch.py:174-178``).
"""

import numpy as np

import pydens_tpu.numpy as jnp  # drop-in jnp: plain math on coordinates
from pydens_tpu import Solver, D, NumpySampler as NS


def kdv(f, x, t):
    return D(f, t) + 6 * f * D(f, x) + D(D(D(f, x), x), x)


def main():
    solver = Solver(kdv, ndims=2, domain=[(-5, 5), (0, 0.5)],
                    initial_condition=lambda x: 2.0 / jnp.cosh(x + 2.0) ** 2,
                    layout="fafaf", features=[24, 24, 1], activation="Tanh",
                    seed=0)
    assert solver._plan_ok  # third-order taps are planned
    sampler = (NS("u", low=-5, high=5, seed=0)
               & NS("u", low=0, high=0.5, seed=1))
    solver.fit(niters=5000, batch_size=1024, lr=0.005, sampler=sampler)

    xs = np.linspace(-5, 5, 101)
    worst = 0.0
    for t in (0.0, 0.25, 0.5):
        pred = solver.predict(xs, np.full_like(xs, t)).ravel()
        true = 2.0 / np.cosh(xs - 4 * t + 2.0) ** 2
        err = np.max(np.abs(pred - true))
        worst = max(worst, err)
        print(f"t={t:4}: max |approx - soliton| = {err:.4f}")
    print(f"final residual loss: {solver.losses[-1]:.2e}")
    assert worst < 0.05
    return solver


if __name__ == "__main__":
    main()
