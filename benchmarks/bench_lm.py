"""Optimizer-ladder benchmark: Adam vs +L-BFGS vs +Gauss-Newton(LM).

How deep can each optimizer family drive the training loss on the README
workload (2D Poisson, ``/root/reference/README.md:35-53``) at a comparable
wall-clock budget?  The reference can only run first-order torch optimizers
(its fit never wires up the LBFGS closure, ``model_torch.py:419-422``), so
everything below the Adam row is superset capability.

Ladder (each stage starts from the previous stage's parameters):
  1. Adam, 1500 iters, batch 100 (the README budget);
  2. + L-BFGS, 200 iters on a fixed 1024-point batch;
  3. + LM (damped Gauss-Newton, matrix-free CG), 50 iters on the same
     fixed-batch size.

Also reports an LM-only column (Adam warmup 300 iters then LM) to show the
finisher does not need a deep first-order phase.

    python benchmarks/bench_lm.py
"""

import time

import numpy as np
import jax

import pydens_tpu as pdt
from pydens_tpu import Solver, D


def pde(f, x, y):
    return D(D(f, x), x) + D(D(f, y), y) - 5 * pdt.sin(np.pi * (x + y))


def _solution_err(solver):
    # No closed form for this RHS on the unit square with u=1 boundary;
    # use the PDE residual on a dense grid as the solution-quality probe.
    g = np.linspace(0, 1, 101)
    X, Y = np.meshgrid(g, g)
    return float(np.mean(solver.residual(X.ravel(), Y.ravel())))


def _fit_timed(solver, **kw):
    t0 = time.perf_counter()
    solver.fit(progress=False, **kw)
    return time.perf_counter() - t0


def main():
    print(f"backend={jax.devices()[0].platform}; 2D Poisson README config "
          "('fa fa fa f' Tanh [10,12,15,1], bc=1)")
    rows = []

    def snap(name, solver, wall):
        rows.append((name, solver.losses[-1], _solution_err(solver), wall))
        print(f"{name:32s} loss {rows[-1][1]:.3e}  "
              f"mean|residual| {rows[-1][2]:.3e}  (+{wall:.1f}s)")

    solver = Solver(pde, ndims=2, boundary_condition=1, layout="fa fa fa f",
                    activation="Tanh", units=[10, 12, 15, 1], seed=0)
    w = _fit_timed(solver, niters=1500, batch_size=100)
    snap("adam 1500 (README budget)", solver, w)

    w = _fit_timed(solver, niters=200, batch_size=1024, optimizer="LBFGS",
                   resample=False)
    snap("+ lbfgs 200 @1024 fixed", solver, w)

    w = _fit_timed(solver, niters=50, batch_size=1024, optimizer="LM",
                   resample=False)
    snap("+ lm 50 @1024 fixed", solver, w)

    short = Solver(pde, ndims=2, boundary_condition=1, layout="fa fa fa f",
                   activation="Tanh", units=[10, 12, 15, 1], seed=0)
    w = _fit_timed(short, niters=300, batch_size=100)
    w += _fit_timed(short, niters=50, batch_size=1024, optimizer="LM",
                    resample=False)
    snap("adam 300 + lm 50 @1024", short, w)

    return rows


if __name__ == "__main__":
    main()
