"""Workload 5 — inverse problem with a trainable coefficient (reference
README.md:95-128, tutorial cells 50-63):

    f'(x) = 2*pi*cos(2*pi*x) - c,   f(0) = 1,

where `c` (the V-token variable 'new_var') is unknown.  An interior
constraint f(0.5) = 0 makes the problem well-posed; the solver recovers
c -> 2 and f -> sin(2*pi*x) + 1 - 2x via two-phase training.
"""

import numpy as np

import pydens_tpu as pdt
from pydens_tpu import Solver, D, V


def odevar(f, x):
    return (D(f, x) - 2 * np.pi * pdt.cos(2 * np.pi * x)
            + V("new_var", data=np.array([1.0])))


def main():
    solver = Solver(odevar, ndims=1, initial_condition=1,
                    constraints=lambda f, x: f(np.array([0.5])), seed=0)

    # Phase 1: freeze the unknown, pre-solve the equation with c = 1.
    solver.model.freeze_trainable(variables=("new_var",))
    solver.fit(niters=400, batch_size=500, lr=0.1)

    # Phase 2: unfreeze; the interior constraint drives c toward 2.
    solver.model.unfreeze_trainable(variables=["new_var"])
    solver.fit(niters=300, batch_size=100, lr=0.1,
               loss_terms=["equation", "constraint_0"])

    c = float(np.asarray(solver.params["variables"]["new_var"])[0])
    xs = np.linspace(0, 1, 100)
    err = np.max(np.abs(solver.predict(xs).ravel()
                        - (np.sin(2 * np.pi * xs) + 1 - 2 * xs)))
    print(f"recovered coefficient c = {c:.3f} (true: 2)")
    print(f"max |approx - analytic|: {err:.4f}")
    assert abs(c - 2.0) < 0.35
    return solver


if __name__ == "__main__":
    main()
