"""Diagnose the r04 Burgers wall regression: time example 16's two fits
(adaptive Adam, L-BFGS polish) separately for cold (compile-inclusive) and
warm dispatch, under PYDENS_TPU_LOOP_UNROLL as set in the environment.
Compile seconds are attributed via jax.monitoring (trace + lowering +
backend compile)."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# One source of truth for the jax.monitoring event list/accumulator —
# bench.py owns it (a renamed /jax/core/compile/* event gets fixed once).
from bench import _COMPILE_SECONDS as COMPILE  # noqa: E402
from bench import _install_compile_listener as install_listener  # noqa: E402


def main():
    install_listener()
    import pydens_tpu as pdt
    from pydens_tpu import Solver, D, NumpySampler as NS

    NU = 0.01 / np.pi
    unroll = os.environ.get("PYDENS_TPU_LOOP_UNROLL", "(default)")

    def burgers(f, x, t):
        return D(f, t) + f * D(f, x) - NU * D(D(f, x), x)

    solver = Solver(burgers, ndims=2, seed=0,
                    domain=[(-1.0, 1.0), (0.0, 1.0)],
                    initial_condition=lambda x: -pdt.sin(np.pi * x),
                    boundary_condition=0,
                    arch="modified", features=[20] * 8 + [1],
                    activation="Tanh")
    sampler = (NS("u", low=-1, high=1, seed=0)
               & NS("u", low=0, high=1, seed=1))

    def timed(tag, **kw):
        c0, t0 = COMPILE["total"], time.perf_counter()
        solver.fit(sampler=sampler, progress=False, **kw)
        wall = time.perf_counter() - t0
        comp = COMPILE["total"] - c0
        print(f"unroll={unroll} {tag}: wall={wall:.1f}s compile={comp:.1f}s",
              flush=True)
        return wall, comp

    timed("adaptive-cold", niters=6000, batch_size=2048, lr=2e-3, adaptive=8)
    timed("lbfgs-cold", niters=1000, batch_size=10000, optimizer="LBFGS",
          resample=False)
    solver.reset(seed=0)
    timed("adaptive-warm", niters=6000, batch_size=2048, lr=2e-3, adaptive=8)
    timed("lbfgs-warm", niters=1000, batch_size=10000, optimizer="LBFGS",
          resample=False)


if __name__ == "__main__":
    main()
