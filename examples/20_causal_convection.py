"""Causal training on advection-dominated transport.

Plain PINN training on the periodic convection equation

    u_t + c u_x = 0,   u(x, 0) = sin(2 pi x),   u(0, t) = u(1, t)

famously fails as ``c`` grows: with the loss summed uniformly over time,
the optimizer satisfies late times with a trivial (near-zero) field
before information has propagated from the initial condition, and gets
stuck there.  ``fit(causal=eps)`` cures this by weighting each time bin's
residual with ``exp(-eps * normalized cumulative residual at earlier
times)`` — late times only start to matter once early times are solved
(Wang, Sankaran & Perdikaris-style causality, with a scale-free
temperature; the exact-IC ansatz anchors t0).  ``eps`` is a runtime
scalar, so annealing it across fit calls reuses one compiled step.

Measured on one v5e chip at c = 4 (this script's config, equal 40k-iter
budget): plain rel-L2 0.48 vs causal 0.15 — a 3.3x accuracy win from
scheduling alone.  At c >= 10 the bottleneck becomes spectral, not
causal: the solution sin(2*pi*(x - c*t)) oscillates c times along t, and
a raw-coordinate tanh MLP can't represent that at any budget.  Random
Fourier features on the t column fix it (``main(C=10)``): rel-L2 0.023
with the gated modified MLP at the same 40k budget, and c=30 reaches
0.0065 at 240k iters — full sweep in BENCHMARKS.md "Follow-up (RFF
lands)".

NOTE: CPU-suite budget is far below where the effect materializes
(tests/test_examples.py TPU_ONLY); the suite still covers the machinery
(tests/test_causal.py: eps=0 == plain MSE exactly, validation, front
dynamics).  No reference counterpart.
"""

import numpy as np

import pydens_tpu as pdt
from pydens_tpu import Solver, D

C = 4.0


def main(C=C):
    def convection(f, x, t):
        return D(f, t) + C * D(f, x)

    # At high c the t-axis content is high-frequency: add random Fourier
    # features on t (x keeps its exact periodic embedding — RFF dims
    # default to the non-periodic columns).  sigma ~ the dominant
    # t-frequency, NOT above it (measured, BENCHMARKS.md).
    rff = None if C <= 4 else (32, float(C))
    akw = (dict(layout="fa fa fa f") if C <= 4
           else dict(arch="modified"))  # gated body: measured 1.5x at c=10
    solver = Solver(convection, ndims=2, seed=0, periodic=(0,),
                    initial_condition=lambda x: pdt.sin(2 * np.pi * x),
                    activation="Tanh", features=[64, 64, 64, 1],
                    fourier_features=rff, **akw)
    # Anneal the causal temperature; eps is dynamic — one compile total.
    solver.fit(niters=20000, batch_size=2048, lr=1e-3, causal=5.0,
               chunk_size=20000, progress=False)
    solver.fit(niters=20000, batch_size=2048, lr=1e-3, causal=20.0,
               chunk_size=20000, progress=False)

    xs = np.linspace(0, 1, 129)
    ts = np.linspace(0, 1, 201)
    X, T = np.meshgrid(xs, ts)
    pred = solver.predict(X.ravel(), T.ravel()).ravel()
    true = np.sin(2 * np.pi * (X - C * T)).ravel()
    rel = np.linalg.norm(pred - true) / np.linalg.norm(true)
    print(f"c={C} causal rel_l2 = {rel:.4f}")
    assert rel < 0.25, rel
    return solver


if __name__ == "__main__":
    main()
