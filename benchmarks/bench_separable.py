"""Separable (SPINN-style) vs pointwise PINN on 3D Poisson: throughput,
equal-wall-clock accuracy, and dense-grid inference.

    -Δu = 3π² sin(πx)sin(πy)sin(πz) on (0,1)³, u|∂Ω = 0.

What is measured (each fit is ONE chunked device dispatch, and successive
iterations chain parameter state, so the tunnel's dispatch memoization
cannot fake the timing — CLAUDE.md):

* training throughput: iterations/s and collocation points/s for the
  pointwise ConvBlockModel (batches 4096 and 65536) vs SeparableModel
  (32 and 64 points per axis = 32768 / 262144 grid points per iteration);
* equal-wall-clock accuracy: fresh solvers trained for ~the same seconds,
  rel-L2 against the analytic solution on a 33³ grid;
* dense inference: a 129³ (≈2.1M-point) evaluation via the factorized
  ``predict_grid`` vs the pointwise bucketed ``predict``.

Run: ``python benchmarks/bench_separable.py [--cpu]``.
"""

import argparse
import time

import numpy as np

import jax

parser = argparse.ArgumentParser()
parser.add_argument("--cpu", action="store_true")
parser.add_argument("--seconds", type=float, default=8.0,
                    help="wall-clock budget per equal-time training arm")
parser.add_argument("--quick", action="store_true",
                    help="small arms only (CPU plumbing check)")
args = parser.parse_args()
if args.cpu:
    jax.config.update("jax_platforms", "cpu")

import pydens_tpu as pdt  # noqa: E402
from pydens_tpu import Solver, D, SeparableModel  # noqa: E402


def poisson(f, x, y, z):
    return (D(D(f, x), x) + D(D(f, y), y) + D(D(f, z), z)
            + 3 * np.pi ** 2 * pdt.sin(np.pi * x)
            * pdt.sin(np.pi * y) * pdt.sin(np.pi * z))


def make(kind):
    if kind == "separable":
        return Solver(poisson, ndims=3, boundary_condition=0.0,
                      model=SeparableModel, layout="fa fa f",
                      features=[32, 32, 32], activation="Tanh", seed=0)
    return Solver(poisson, ndims=3, boundary_condition=0.0,
                  layout="fa fa f", features=[64, 64, 1],
                  activation="Tanh", seed=0)


def rel_l2(s):
    g = np.linspace(0, 1, 33).astype(np.float32)
    pred = s.predict_grid(g, g, g)[..., 0]
    sg = np.sin(np.pi * g)
    true = sg[:, None, None] * sg[None, :, None] * sg[None, None, :]
    return float(np.linalg.norm(pred - true) / np.linalg.norm(true))


def throughput(kind, batch, iters=300):
    s = make(kind)
    s.fit(niters=20, batch_size=batch, lr=2e-3, chunk_size=20,
          progress=False)  # compile + warm
    t0 = time.perf_counter()
    s.fit(niters=iters, batch_size=batch, lr=2e-3, chunk_size=iters,
          optimizer=None, progress=False)
    dt = time.perf_counter() - t0
    pts = batch ** 3 if kind == "separable" else batch
    print(f"{kind:10s} batch={batch:6d}  {iters / dt:8.1f} it/s  "
          f"{iters / dt * pts / 1e6:10.2f} Mpts/s", flush=True)
    return iters / dt


def equal_time(kind, batch, rate, seconds):
    n = max(50, int(rate * seconds))
    s = make(kind)
    s.fit(niters=20, batch_size=batch, lr=2e-3, chunk_size=20,
          progress=False)
    t0 = time.perf_counter()
    s.fit(niters=n, batch_size=batch, lr=2e-3, chunk_size=n,
          optimizer=None, progress=False)
    dt = time.perf_counter() - t0
    r = rel_l2(s)
    print(f"{kind:10s} batch={batch:6d}  {n:6d} iters in {dt:6.2f}s  "
          f"rel_l2={r:.5f}", flush=True)
    return r


def dense_eval():
    s = make("separable")
    s.fit(niters=50, batch_size=32, lr=2e-3, chunk_size=50, progress=False)
    g = np.linspace(0, 1, 129).astype(np.float32)
    s.predict_grid(g[:8], g[:8], g[:8])  # compile the grid entry
    t0 = time.perf_counter()
    out = s.predict_grid(g, g, g)
    t_grid = time.perf_counter() - t0
    X, Y, Z = np.meshgrid(g[:33], g[:33], g[:33], indexing="ij")
    pts = np.stack([X.ravel(), Y.ravel(), Z.ravel()], 1)
    s.predict(pts)  # compile the pointwise bucket
    t0 = time.perf_counter()
    s.predict(pts)
    t_pw = time.perf_counter() - t0
    print(f"dense eval: predict_grid 129^3 ({out.size / 1e6:.2f}M pts) "
          f"{t_grid:.3f}s; pointwise predict 33^3 "
          f"({pts.shape[0] / 1e3:.0f}k pts) {t_pw:.3f}s", flush=True)


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}")
    arms = ((("pointwise", (1024,)), ("separable", (32,))) if args.quick
            else (("pointwise", (4096, 65536)), ("separable", (32, 64))))
    iters = 60 if args.quick else 300
    rates = {}
    for kind, batches in arms:
        for b in batches:
            rates[(kind, b)] = throughput(kind, b, iters=iters)
    print("-- equal wall-clock --")
    pw_b = arms[0][1][0]
    equal_time("pointwise", pw_b, rates[("pointwise", pw_b)], args.seconds)
    for b in arms[1][1]:
        equal_time("separable", b, rates[("separable", b)], args.seconds)
    dense_eval()
