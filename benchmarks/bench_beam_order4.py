"""Order-4 Taylor plan vs nested-jvp fallback on a biharmonic workload.

Euler–Bernoulli beam residual (u_xxxx, the fourth-order class the order-4
plan exists for), full training step, one dispatch per timing run so the
tunnel's fixed latency amortizes away.

    python benchmarks/bench_beam_order4.py
"""

import time

import jax

from pydens_tpu import Solver, D


def beam(f, x):
    return (D(D(D(D(f, x), x), x), x) - 384.0) / 384.0


def run(fast_taps, iters=20_000, batch=1024):
    solver = Solver(beam, ndims=1, boundary_condition=0, seed=0,
                    layout="fafaf", features=[24, 24, 1], activation="Tanh")
    assert solver._plan_ok
    # warm-up compile
    solver.fit(niters=iters, batch_size=batch, chunk_size=iters,
               fast_taps=fast_taps, progress=False)
    solver.reset(seed=1)
    t0 = time.perf_counter()
    solver.fit(niters=iters, batch_size=batch, chunk_size=iters,
               fast_taps=fast_taps, progress=False)
    dt = time.perf_counter() - t0
    return dt / iters


def main():
    print(f"backend={jax.devices()[0].platform}; beam u_xxxx, "
          "'fafaf' Tanh [24,24,1], batch 1024, 20k iters single dispatch")
    t_fb = run(False)
    t_plan = run(True)
    print(f"nested-jvp fallback: {t_fb*1e6:6.1f} us/it  "
          f"({1/t_fb:8.0f} it/s)")
    print(f"Taylor plan (order-4): {t_plan*1e6:6.1f} us/it  "
          f"({1/t_plan:8.0f} it/s)")
    print(f"speedup: {t_fb/t_plan:.2f}x")


if __name__ == "__main__":
    main()
