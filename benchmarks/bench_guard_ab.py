"""A/B: cost of the device-side divergence guard on the sustained workload.

Round 3 made ``stop_on_nan=True`` the default, replacing the compiled
chunk's ``fori_loop`` body with a ``while_loop`` whose predicate reads each
iteration's freshly-written loss (``solver.py`` run_chunk).  BENCH_r03's
sustained throughput then fell ~24% vs r02 (70.4k vs 92.9k it/s) with no
measurement separating "guard cost" from "tunnel variance".  This script
settles it: the exact bench.py sustained workload (README 2D Poisson,
batch 100, one 30k-iteration dispatch), N interleaved reps per arm.

Run on the real TPU: ``python benchmarks/bench_guard_ab.py [reps]``.
Prints a JSON line per arm plus a summary.  Seeds differ per rep (the
tunnel memoizes identical dispatches — CLAUDE.md).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(reps=5):
    import pydens_tpu as pdt
    from pydens_tpu import Solver, D

    def pde(f, x, y):
        return D(D(f, x), x) + D(D(f, y), y) - 5 * pdt.sin(np.pi * (x + y))

    solver = Solver(pde, ndims=2, boundary_condition=1,
                    layout="fa fa fa f", activation="Tanh",
                    units=[10, 12, 15, 1], seed=0)
    n = 30000
    arms = {True: [], False: []}
    # Warm both compiles first so neither arm pays compile time.
    for guard in (True, False):
        solver.reset(seed=1000 + guard)
        solver.fit(batch_size=100, niters=n, progress=False, chunk_size=n,
                   stop_on_nan=guard)
    # Interleave arms so tunnel drift hits both equally.
    for rep in range(reps):
        for guard in (True, False):
            solver.reset(seed=10 * rep + 2 + guard)
            t0 = time.perf_counter()
            solver.fit(batch_size=100, niters=n, progress=False,
                       chunk_size=n, stop_on_nan=guard)
            arms[guard].append(n / (time.perf_counter() - t0))
    out = {}
    for guard, rates in arms.items():
        key = "guard_on" if guard else "guard_off"
        out[key] = {"iters_per_sec": [round(r, 1) for r in rates],
                    "median": round(float(np.median(rates)), 1),
                    "best": round(float(np.max(rates)), 1)}
    out["on_over_off_median"] = round(
        out["guard_on"]["median"] / out["guard_off"]["median"], 4)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 5)
