"""Ensemble training and epistemic uncertainty: 8 networks train in one
vmapped step (nearly free — tiny PINN nets leave the chip idle), and their
spread quantifies where the learned solution is trustworthy."""

import numpy as np

import pydens_tpu as pdt
from pydens_tpu import Solver, D


def main():
    def ode(f, x):
        return D(f, x) - 2 * np.pi * pdt.cos(2 * np.pi * x)

    solver = Solver(ode, ndims=1, initial_condition=.5, activation="Tanh",
                    layout="fafaf", features=[12, 10, 1], seed=0, n_models=8)
    solver.fit(niters=500, batch_size=400, lr=0.02)

    xs = np.linspace(0, 1, 100)
    mean = solver.predict(xs).ravel()
    std = solver.predict_std(xs).ravel()
    true = np.sin(2 * np.pi * xs) + .5
    err = np.abs(mean - true)
    print(f"ensemble mean max err: {err.max():.4f}")
    print(f"uncertainty range: [{std.min():.5f}, {std.max():.5f}]")
    # the ensemble mean should be at least as good as typical members
    assert err.max() < 0.05
    # uncertainty should be small where the fit is good
    assert std.mean() < 0.05
    return solver


if __name__ == "__main__":
    main()
