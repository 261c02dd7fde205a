"""Workload 3 — a parametric family of ODEs (reference README.md:62-87,
tutorial cells 28-34): one network solves

    f'(x) = e * pi * cos(e * pi * x),  f(0) = 2

for every phase e in [0.5, 5.5] at once.  Analytic: f = sin(e*pi*x) + 2.
"""

import numpy as np

import pydens_tpu as pdt
from pydens_tpu import Solver, D, NumpySampler as NS


def odeparam(f, x, e):
    return D(f, x) - e * np.pi * pdt.cos(e * np.pi * x)


def main():
    solver = Solver(odeparam, ndims=1, initial_condition=2.0, nparams=1,
                    seed=0)
    sampler = NS("u", seed=0) & NS("u", low=.5, high=5.5, seed=1)
    solver.fit(niters=7000, batch_size=700, sampler=sampler, lr=0.01)

    xs = np.linspace(0, 1, 100)
    for eps in (1.0, 2.5, 4.0):
        approx = solver.predict(xs, eps).ravel()
        true = np.sin(eps * np.pi * xs) + 2
        err = np.max(np.abs(approx - true))
        print(f"eps={eps}: max |approx - analytic| = {err:.4f}")
        assert err < 0.35
    return solver


if __name__ == "__main__":
    main()
