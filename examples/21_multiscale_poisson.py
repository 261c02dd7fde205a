"""Multiscale 1D Poisson — spectral bias and its cure, suite-sized.

    u'' = -(2π)² sin(2πx) - 0.1 (2πk)² sin(2πkx),  u(0) = u(1) = 0,  k = 8

has the closed form u = sin(2πx) + 0.1 sin(2πkx): an O(1) slow mode plus
a small fast mode whose *source* dominates the residual (the (2πk)²
factor).  A raw-coordinate tanh MLP cannot train it at all (measured
max err 0.31 at this budget — it misfits even the slow mode, because
the unlearnable fast source acts as loss noise); random Fourier
features at σ ≈ k solve it to ~2% (CPU seed spread 0.005-0.023).

This is the CPU-budget companion to the TPU-scale convection study in
BENCHMARKS.md "Follow-up (RFF lands)".  Honest architecture note: the
gated modified MLP — a clear win on convection and Burgers — measured
WORSE here (0.06 vs 0.023 at equal budget); the plain chain + RFF is
the right tool for this 1D problem.

Boundary conditions bind exactly through the ansatz (no penalty terms);
the equation uses the reference's own ``D``-token API
(``/root/reference/pydens/model_torch.py:174-188``).  No reference
counterpart example.
"""

import numpy as np

import pydens_tpu as pdt
from pydens_tpu import Solver, D

K = 8.0


def exact(x):
    return np.sin(2 * np.pi * x) + 0.1 * np.sin(2 * np.pi * K * x)


def main():
    def poisson(f, x):
        return (D(D(f, x), x)
                + (2 * np.pi) ** 2 * pdt.sin(2 * np.pi * x)
                + 0.1 * (2 * np.pi * K) ** 2 * pdt.sin(2 * np.pi * K * x))

    solver = Solver(poisson, ndims=1, seed=0, boundary_condition=0,
                    layout="fa fa f", features=[32, 32, 1],
                    activation="Tanh", fourier_features=(32, K))
    solver.fit(niters=4000, batch_size=512, lr=3e-3, progress=False)

    xs = np.linspace(0, 1, 400)
    err = np.max(np.abs(solver.predict(xs).ravel() - exact(xs)))
    print(f"max abs error: {err:.4f}  (fast-mode amplitude: 0.1; "
          f"raw-coordinate net: 0.31)")
    # the fast mode is amplitude 0.1 — err must resolve well within it
    assert err < 0.05, err
    return solver


if __name__ == "__main__":
    main()
