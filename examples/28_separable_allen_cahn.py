"""Allen-Cahn with a separable PINN — the measured best recipe here.

    u_t = 1e-4 u_xx + 5 (u - u³),  x ∈ [-1, 1) periodic,  t ∈ [0, 1],
    u(x, 0) = x² cos(πx)

The pointwise recipe (examples/25: multi-harmonic periodic embedding +
persistent IC binding + annealed causal weighting) reaches rel-L2 ~0.30
at t=0.25 in its 200 s CPU-suite budget.  The separable model replaces
the economics AND the causal machinery works better on it: every
iteration trains a dense 64×64 tensor grid (4096 points at two 64-row
MLP evaluations), and causal weighting uses exact per-time-slice mean
residuals instead of a 32-bin histogram.  Measured (BENCHMARKS.md
"Separable PINN — Allen-Cahn"): rel-L2 **0.008 / 0.017 / 0.057** at
t = 0.25/0.5/1.0 in ~70 s CPU — a ~40x error reduction over the
pointwise recipe at a third of the wall-clock, reaching the full
horizon the pointwise budget never did.

Same ingredients otherwise: `periodic={0: 10}` multi-harmonic embedding
(per axis, separability-preserving), persistent exact-IC binding
(`periodic_ic_decay=False` acknowledges the wrap-kink advisory — the
IC slope jumps by 4 across x = ±1), `causal=eps` annealed 1 → 20 with
one compile (eps is a runtime scalar).
"""

import numpy as np

import pydens_tpu as pdt
from pydens_tpu import Solver, D, SeparableModel


def spectral_truth(nx=512, nt=2001, t_evals=(0.25, 0.5, 1.0)):
    """512-mode Fourier spectral RK4 ground truth."""
    x = np.linspace(-1, 1, nx, endpoint=False)
    k = np.fft.fftfreq(nx, d=2.0 / nx) * 2 * np.pi
    u = (x ** 2) * np.cos(np.pi * x)
    dt = 1.0 / (nt - 1)

    def rhs(u):
        return (1e-4 * np.real(np.fft.ifft(-(k ** 2) * np.fft.fft(u)))
                + 5 * (u - u ** 3))

    out = {}
    for i in range(nt - 1):
        k1 = rhs(u); k2 = rhs(u + dt / 2 * k1)
        k3 = rhs(u + dt / 2 * k2); k4 = rhs(u + dt * k3)
        u = u + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
        t = (i + 1) * dt
        for te in t_evals:
            if abs(t - te) < dt / 2:
                out[te] = u.copy()
    return x, out


def main(iters_per_stage=4000):
    def allen_cahn(f, x, t):
        return D(f, t) - 1e-4 * D(D(f, x), x) - 5.0 * (f - f ** 3)

    solver = Solver(allen_cahn, ndims=2, seed=0, domain=[(-1, 1), (0, 1)],
                    initial_condition=lambda x: x ** 2 * pdt.cos(np.pi * x),
                    periodic={0: 10}, periodic_ic_decay=False,
                    model=SeparableModel, activation="Tanh",
                    layout="fa fa fa f", features=[64, 64, 64, 64])
    for eps in (1.0, 5.0, 20.0):  # one compile: eps is a runtime scalar
        solver.fit(niters=iters_per_stage, batch_size=64, lr=1e-3,
                   causal=eps, chunk_size=iters_per_stage, progress=False)

    x_ref, truths = spectral_truth()
    rels = []
    for te, ut in sorted(truths.items()):
        pred = solver.predict(x_ref, np.full_like(x_ref, te)).ravel()
        rels.append(np.linalg.norm(pred - ut) / np.linalg.norm(ut))
    print("separable allen-cahn rel_l2(t=0.25/0.5/1.0) = "
          + " ".join(f"{r:.4f}" for r in rels))
    assert rels[0] < 0.05 and rels[-1] < 0.15, rels
    return solver


if __name__ == "__main__":
    main()
