"""Separable PINN (SPINN-style) on a 3D Poisson problem.

    -Δu = 3 π² sin(πx) sin(πy) sin(πz)  on (0,1)³,  u = 0 on the boundary
    ⇒ u = sin(πx) sin(πy) sin(πz)

Pointwise PINNs hit a wall in 3D+: resolving the domain needs N³
collocation points, and every point pays a full network evaluation (plus
its second-derivative taps).  ``SeparableModel`` factorizes the solution
as ``u(x,y,z) = Σ_r h_x(x)[r] · h_y(y)[r] · h_z(z)[r]`` with one small MLP
per axis, so a 32³ = 32 768-point grid per iteration costs three 32-row
MLP evaluations plus matmul contractions — the grid work rides the MXU as
einsums, not the network.  Derivatives come through the same ``D`` token
(a tangent on one axis's points differentiates only that axis's MLP).

Equal-budget contrast measured in BENCHMARKS.md ("Separable PINN"): at
the same wall-clock the pointwise model sees ~100x fewer collocation
points.  Dense evaluation is factorized too: ``predict_grid`` returns the
full 65³ verification grid from three axis evaluations.

No reference counterpart (`/root/reference` is pointwise-only); the
architecture follows the public SPINN formulation (Cho et al. 2023).
"""

import numpy as np

import pydens_tpu as pdt
from pydens_tpu import Solver, D, SeparableModel


def main(niters=500):
    def poisson(f, x, y, z):
        return (D(D(f, x), x) + D(D(f, y), y) + D(D(f, z), z)
                + 3 * np.pi ** 2 * pdt.sin(np.pi * x)
                * pdt.sin(np.pi * y) * pdt.sin(np.pi * z))

    solver = Solver(poisson, ndims=3, boundary_condition=0.0,
                    model=SeparableModel, layout="fa fa f",
                    features=[32, 32, 32], activation="Tanh", seed=0)
    # batch_size is points PER AXIS: 32**3 = 32768 grid points/iteration.
    solver.fit(niters=niters, batch_size=32, lr=2e-3, progress=False)

    g = np.linspace(0, 1, 65)
    pred = solver.predict_grid(g, g, g)[..., 0]  # 65^3 grid, 3 axis evals
    s = np.sin(np.pi * g)
    true = s[:, None, None] * s[None, :, None] * s[None, None, :]
    rel = np.linalg.norm(pred - true) / np.linalg.norm(true)
    print(f"separable 3d poisson rel_l2 = {rel:.5f} "
          f"({niters} iters x 32^3 grid points)")
    assert rel < 0.02, rel
    return solver


if __name__ == "__main__":
    main()
