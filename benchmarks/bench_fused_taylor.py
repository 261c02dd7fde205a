"""Fused Pallas Taylor kernel vs XLA paths at large collocation batches.

The large-batch training step is HBM-bandwidth-bound under XLA
(~50 kB/point, 98% of v5e HBM peak — BENCHMARKS.md roofline).  The fused
kernel keeps the traversal + adjoint in VMEM, so it should leave the
bandwidth wall behind; this measures all three paths on the scaling
workload.

    python benchmarks/bench_fused_taylor.py
"""

import os
import time

import numpy as np
import jax

import pydens_tpu as pdt
from pydens_tpu import Solver, D


def pde(f, x, y):
    return D(D(f, x), x) + D(D(f, y), y) - 5 * pdt.sin(np.pi * (x + y))


def make_solver():
    return Solver(pde, ndims=2, boundary_condition=1, layout="fa fa fa f",
                  activation="Tanh", units=[64, 64, 64, 1], seed=0)


def run(solver, batch, fast_taps, iters=200):
    solver.reset(seed=0)
    solver.fit(niters=iters, batch_size=batch, progress=False,
               chunk_size=iters, fast_taps=fast_taps)
    solver.reset(seed=1)
    t0 = time.perf_counter()
    solver.fit(niters=iters, batch_size=batch, progress=False,
               chunk_size=iters, fast_taps=fast_taps)
    return iters / (time.perf_counter() - t0)


def main():
    print(f"backend={jax.devices()[0].platform}; 2D Poisson "
          "'fa fa fa f' Tanh [64,64,64,1], full train step")
    for batch in (65536, 262144, 1048576):
        os.environ["PYDENS_TPU_FUSED_TAYLOR"] = "never"
        s = make_solver()
        jvp_ips = run(s, batch, False)
        plan_ips = run(s, batch, True)
        os.environ["PYDENS_TPU_FUSED_TAYLOR"] = "always"
        s2 = make_solver()
        fused_ips = run(s2, batch, True)
        best = max(jvp_ips, plan_ips)
        print(f"batch {batch:>8}: nested-jvp {jvp_ips:6.1f} it/s | "
              f"xla-plan {plan_ips:6.1f} | FUSED {fused_ips:6.1f} "
              f"({fused_ips / best:4.2f}x best-XLA, "
              f"{fused_ips * batch / 1e6:7.1f} Mpts/s)")
    os.environ.pop("PYDENS_TPU_FUSED_TAYLOR", None)


if __name__ == "__main__":
    main()
