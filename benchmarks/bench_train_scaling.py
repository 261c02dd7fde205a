"""Training-throughput scaling: collocation points/second vs batch size.

The README benchmark (batch 100) exercises per-iteration overhead; real
workloads scale the batch until the MXU saturates.  This sweep measures the
full training step (sampling + nested-jvp residual + grad + Adam) at
increasing batch sizes on the default backend.

    python benchmarks/bench_train_scaling.py
"""

import time

import numpy as np
import jax

import pydens_tpu as pdt
from pydens_tpu import Solver, D


def pde(f, x, y):
    return D(D(f, x), x) + D(D(f, y), y) - 5 * pdt.sin(np.pi * (x + y))


def main():
    print(f"backend={jax.devices()[0].platform}; 2D Poisson, "
          "'fa fa fa f' Tanh [64,64,64,1]")
    solver = Solver(pde, ndims=2, boundary_condition=1,
                    layout="fa fa fa f", activation="Tanh",
                    units=[64, 64, 64, 1], seed=0)
    iters = 200
    for batch in (128, 1024, 8192, 65536, 262144):
        solver.reset(seed=0)
        # warm-up compile for this batch size
        solver.fit(niters=iters, batch_size=batch, progress=False,
                   chunk_size=iters)
        solver.reset(seed=1)
        t0 = time.perf_counter()
        solver.fit(niters=iters, batch_size=batch, progress=False,
                   chunk_size=iters)
        dt = time.perf_counter() - t0
        pts_per_s = iters * batch / dt
        print(f"batch {batch:>7}: {iters/dt:8.0f} it/s  "
              f"{pts_per_s/1e6:8.2f} Mpts/s  ({dt*1e3:.0f} ms / {iters} it)")


if __name__ == "__main__":
    main()
