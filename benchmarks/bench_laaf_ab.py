"""A/B: layer-wise adaptive activations (L-LAAF, ``adaptive_activation=n``)
vs the plain fixed-activation net at equal budget.

L-LAAF (Jagtap/Kawaguchi/Karniadakis, arXiv 1909.12228) claims faster
convergence from trainable per-layer slopes ``sigma(n * a_i * h)``.  Two
workloads probe the claim where it should and shouldn't matter:

1. Moderately high-frequency ODE ``u' = 2 pi k cos(2 pi k x)``, k=4 — the
   spectral-bias regime where a raw tanh MLP trains slowly (k=6 fails
   outright; the RFF A/B covers that rescue).  Slope growth effectively
   raises the net's frequency content, the paper's mechanism.
2. The README 2D Poisson — a smooth low-frequency baseline where LAAF has
   nothing to fix (honesty control).

Per (workload, arm, seed): final max analytic error / final loss.  Run on
CPU or TPU: ``python benchmarks/bench_laaf_ab.py``.  Prints one JSON line
per cell and a markdown summary for BENCHMARKS.md.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pydens_tpu as pdt
from pydens_tpu import D, Solver

SEEDS = (0, 1, 2)
ARMS = {"plain": None, "laaf_n5": 5.0, "laaf_n10": 10.0}


def hf_ode_cell(aa, seed, k=4.0):
    def ode(f, x):
        return D(f, x) - 2 * np.pi * k * pdt.cos(2 * np.pi * k * x)

    s = Solver(ode, ndims=1, initial_condition=0.0, seed=seed,
               layout="fa fa f", features=[32, 32, 1], activation="Tanh",
               adaptive_activation=aa)
    s.fit(niters=1500, batch_size=512, lr=2e-3, progress=False)
    xs = np.linspace(0, 1, 401)
    err = float(np.max(np.abs(s.predict(xs).ravel()
                              - np.sin(2 * np.pi * k * xs))))
    slopes = [float(v["a"][0]) for nm, v in s.model.params["net"].items()
              if nm.startswith("aa")] if aa else []
    return err, slopes


def poisson_cell(aa, seed):
    def poisson(f, x, y):
        return (D(D(f, x), x) + D(D(f, y), y)
                + 5.0 * pdt.sin(np.pi * (x + y)))

    s = Solver(poisson, ndims=2, boundary_condition=1, seed=seed,
               layout="fa fa fa f", features=[10, 12, 15, 1],
               activation="Tanh", adaptive_activation=aa)
    s.fit(niters=1500, batch_size=100, lr=5e-3, progress=False)
    return float(s.losses[-1])


def main():
    rows = []
    for arm, aa in ARMS.items():
        errs, losses = [], []
        for seed in SEEDS:
            err, slopes = hf_ode_cell(aa, seed)
            loss = poisson_cell(aa, seed)
            errs.append(err)
            losses.append(loss)
            print(json.dumps({"workload": "hf_ode_k4", "arm": arm,
                              "seed": seed, "max_err": err,
                              "trained_slopes": slopes}))
            print(json.dumps({"workload": "readme_poisson", "arm": arm,
                              "seed": seed, "final_loss": loss}))
        rows.append((arm, float(np.median(errs)), float(np.max(errs)),
                     float(np.median(losses))))

    print("\n| arm | hf-ODE k=4 median max-err | worst | Poisson median "
          "final loss |")
    print("|---|---|---|---|")
    for arm, med, worst, ploss in rows:
        print(f"| {arm} | {med:.4g} | {worst:.4g} | {ploss:.4g} |")


if __name__ == "__main__":
    main()
