"""Residual-based adaptive collocation on a stiff problem: a source bump of
width ~0.02 that uniform sampling underresolves.  `fit(adaptive=8)` draws
8x candidates per iteration and importance-samples half the batch
proportionally to |residual| (with unbiased weights)."""

import numpy as np

import pydens_tpu as pdt
from pydens_tpu import Solver, D


def make_solver():
    def ode(f, x):
        return D(f, x) - 100 * pdt.exp(-2000 * (x - 0.8) ** 2)

    return Solver(ode, ndims=1, initial_condition=0.0, activation="Tanh",
                  layout="fafaf", features=[32, 32, 1], seed=0)


def main():
    xs = np.linspace(0, 1, 2000)

    uniform = make_solver()
    uniform.fit(niters=1500, batch_size=128, lr=0.01)
    res_uniform = uniform.residual(xs).mean()

    adaptive = make_solver()
    adaptive.fit(niters=1500, batch_size=128, lr=0.01, adaptive=8)
    res_adaptive = adaptive.residual(xs).mean()

    print(f"mean |residual| uniform:  {res_uniform:.4f}")
    print(f"mean |residual| adaptive: {res_adaptive:.4f} "
          f"({res_uniform / res_adaptive:.1f}x better)")
    assert res_adaptive < res_uniform * 0.6
    return adaptive


if __name__ == "__main__":
    main()
