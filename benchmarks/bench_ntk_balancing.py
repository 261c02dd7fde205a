"""A/B: loss_balancing modes ('grad' vs 'ntk' vs off) on two multi-term
workloads where term scales are mismatched.

1. Mis-scaled beam (tests/test_loss_balancing.py's failure mode): the
   unnormalized 4th-order residual is O(384) and drowns the two clamping
   constraints at unit weights.  Both balancers must rescue it; the
   question is whether the statistic matters.
2. High-frequency 1-D Helmholtz u'' + k^2 u = 0 with penalty BCs
   (u(0)=0, u'(0)=k): per-point equation gradients OSCILLATE at frequency
   k, so the batch-summed gradient magnitude (the 'grad' statistic)
   cancels toward zero while the per-row Jacobian norms (the NTK trace)
   do not — the regime where the two statistics genuinely disagree.

Per (workload, mode, seed): final max analytic error.  Run on CPU or TPU:
``python benchmarks/bench_ntk_balancing.py``.  Prints one JSON line per
cell and a markdown summary for BENCHMARKS.md.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pydens_tpu import D, Solver

XS = np.linspace(0, 1, 201)
SEEDS = (0, 1, 2)


def beam_cell(mode, seed):
    left = np.array([0.0], np.float32)
    right = np.array([1.0], np.float32)
    s = Solver(lambda f, x: D(D(D(D(f, x), x), x), x) - 384.0,
               ndims=1, boundary_condition=0, seed=seed,
               layout="fa fa f", features=[24, 24, 1], activation="Tanh",
               constraints=(lambda f, x: f.grad(left, wrt=0),
                            lambda f, x: f.grad(right, wrt=0)))
    lt = {"equation": 1.0, "constraint_0": 1.0, "constraint_1": 1.0}
    s.fit(niters=2500, batch_size=512, lr=0.01, loss_terms=lt,
          loss_balancing=mode, progress=False)
    true = 16.0 * XS ** 2 * (1 - XS) ** 2
    return float(np.max(np.abs(s.predict(XS).ravel() - true)))


def helmholtz_cell(mode, seed, k=12.0):
    zero = np.array([0.0], np.float32)
    s = Solver(lambda f, x: D(D(f, x), x) + k * k * f,
               ndims=1, seed=seed,
               layout="fa fa fa f", features=[48, 48, 48, 1],
               activation="Tanh",
               constraints=(lambda f, x: f(zero),
                            lambda f, x: f.grad(zero, wrt=0) - k))
    lt = {"equation": 1.0, "constraint_0": 1.0, "constraint_1": 1.0}
    s.fit(niters=4000, batch_size=1024, lr=0.002, loss_terms=lt,
          loss_balancing=mode, progress=False)
    true = np.sin(k * XS)
    return float(np.max(np.abs(s.predict(XS).ravel() - true)))


def main():
    rows = []
    for name, cell in (("beam_misscaled", beam_cell),
                       ("helmholtz_k12", helmholtz_cell)):
        for mode in (None, True, "ntk"):
            label = {None: "off", True: "grad", "ntk": "ntk"}[mode]
            errs = [cell(mode, seed) for seed in SEEDS]
            row = dict(workload=name, mode=label,
                       max_err_per_seed=[round(e, 4) for e in errs],
                       median_max_err=round(float(np.median(errs)), 4))
            print(json.dumps(row))
            rows.append(row)

    print("\n| workload | mode | median max err | per-seed |")
    print("|---|---|---|---|")
    for r in rows:
        print(f"| {r['workload']} | {r['mode']} | {r['median_max_err']} "
              f"| {r['max_err_per_seed']} |")


if __name__ == "__main__":
    main()
