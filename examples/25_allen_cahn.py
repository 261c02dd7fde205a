"""Allen-Cahn: the standard hard PINN benchmark, with the measured recipe.

    u_t = 1e-4 u_xx + 5 (u - u^3),   x in [-1, 1) periodic,   t in [0, 1],
    u(x, 0) = x^2 cos(pi x)

Stiff bistable reaction: sharp transition layers form from a smooth IC
and then propagate — plain PINN training famously collapses to the
trivial metastable branch.  The recipe below is the composition that
measured best here (every ingredient A/B'd in BENCHMARKS.md
"Allen-Cahn"):

* ``periodic={0: 10}``: multi-harmonic exact-periodic embedding — the
  single-harmonic embedding is >2x worse at every time even with double
  the width (the network cannot synthesize higher circle harmonics
  through tanh alone at these budgets).
* persistent exact-IC binding (the default): the IC slope is
  wrap-incompatible (u_x jumps by 4 across x = +-1), yet decaying the
  binding measured strictly worse at every budget — the kink is a soft
  spectral penalty, not a floor, and the persistent term hands the
  network the sharp early-time content for free.
  ``periodic_ic_decay=False`` acknowledges the advisory warning.
* ``fit(causal=eps)`` annealed 1 -> 20: time-ordered residual weighting
  so late times only matter once the layer formation at early times is
  resolved.  eps is a runtime scalar — the staged schedule reuses ONE
  compiled step.

Ground truth: 512-mode Fourier spectral RK4.  The CPU-suite budget
(12k iters) reaches rel-L2 ~0.30 at t=0.25 — early-time layer formation
resolved; the full-horizon literature configuration (width-128 gated
modified MLP ``arch='modified'``, ~250k iters, eps -> 100, staged lr
decay) needs accelerator hardware: see BENCHMARKS.md "Allen-Cahn" for
the sustained TPU numbers and the negative results (time-marching,
decaying-IC) so you don't re-run them.

No reference counterpart (the reference's hardest workload is the wave
equation); this example exists because Allen-Cahn is where naive PINN
recipes break and the measured toolkit earns its keep.

UPDATE: the separable recipe (examples/28) now dominates this one —
full-horizon rel-L2 0.057 in ~70 s CPU vs this script's 0.30 at t=0.25
in 200 s.  This pointwise version stays as the measured baseline and
the recipe for problems where a tensor-product grid does not apply
(non-box domains, pointwise data terms).
"""

import numpy as np

import pydens_tpu as pdt
from pydens_tpu import Solver, D


def spectral_truth(nx=512, nt=2001, t_eval=0.25):
    """Fourier spectral RK4 reference solution at t_eval."""
    x = np.linspace(-1, 1, nx, endpoint=False)
    k = np.fft.fftfreq(nx, d=2.0 / nx) * 2 * np.pi
    u = (x ** 2) * np.cos(np.pi * x)
    dt = 1.0 / (nt - 1)

    def rhs(u):
        return (1e-4 * np.real(np.fft.ifft(-(k ** 2) * np.fft.fft(u)))
                + 5 * (u - u ** 3))

    target = None
    for i in range(nt - 1):
        k1 = rhs(u); k2 = rhs(u + dt / 2 * k1)
        k3 = rhs(u + dt / 2 * k2); k4 = rhs(u + dt * k3)
        u = u + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
        if abs((i + 1) * dt - t_eval) < dt / 2:
            target = u.copy()
    return x, target


def main(iters_per_stage=4000):
    def allen_cahn(f, x, t):
        return D(f, t) - 1e-4 * D(D(f, x), x) - 5.0 * (f - f ** 3)

    solver = Solver(allen_cahn, ndims=2, seed=0, domain=[(-1, 1), (0, 1)],
                    initial_condition=lambda x: x ** 2 * pdt.cos(np.pi * x),
                    periodic={0: 10}, periodic_ic_decay=False,
                    activation="Tanh", layout="fa fa fa fa f",
                    features=[64, 64, 64, 64, 1])
    for eps in (1.0, 5.0, 20.0):  # one compile: eps is a traced scalar
        solver.fit(niters=iters_per_stage, batch_size=1024, lr=1e-3,
                   causal=eps, chunk_size=iters_per_stage, progress=False)

    x_ref, u_true = spectral_truth(t_eval=0.25)
    pred = solver.predict(x_ref, np.full_like(x_ref, 0.25)).ravel()
    rel = np.linalg.norm(pred - u_true) / np.linalg.norm(u_true)
    print(f"allen-cahn rel_l2(t=0.25) = {rel:.4f}")
    assert rel < 0.45, rel
    return solver


if __name__ == "__main__":
    main()
