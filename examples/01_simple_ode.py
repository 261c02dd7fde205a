"""Workload 1 — simple ODE with an initial condition (reference tutorial
cells 12-16):  f'(x) = 2*pi*cos(2*pi*x),  f(0) = 0.5  on [0, 1].

Analytic solution: f(x) = sin(2*pi*x) + 0.5.
"""

import numpy as np

import pydens_tpu as pdt
from pydens_tpu import Solver, D


def ode(f, x):
    return D(f, x) - 2 * np.pi * pdt.cos(2 * np.pi * x)


def main():
    solver = Solver(ode, ndims=1, initial_condition=.5, activation="Tanh",
                    layout="fafaf", features=[12, 10, 1], seed=0)
    solver.fit(niters=500, batch_size=400, lr=0.02)

    xs = np.linspace(0, 1, 100)
    approx = solver.predict(xs).ravel()
    true = np.sin(2 * np.pi * xs) + .5
    err = np.max(np.abs(approx - true))
    print(f"final residual loss: {solver.losses[-1]:.6f}")
    print(f"max |approx - analytic|: {err:.4f}")
    assert err < 0.05
    return solver


if __name__ == "__main__":
    main()
