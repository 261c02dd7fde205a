"""3D Poisson on the unit cube — manufactured solution:

    laplace(u) = -3 pi^2 sin(pi x) sin(pi y) sin(pi z),  u = 0 on all faces
    =>  u = sin(pi x) sin(pi y) sin(pi z)

Demonstrates the Dirichlet-product ansatz in three spatial dimensions
(the boundary condition holds exactly on every face of the cube by
construction) and quasi-Monte-Carlo collocation in 3D.  Same
equation-as-callable API as the reference's 2D Poisson
(``/root/reference/pydens/model_torch.py:174-188``).
"""

import numpy as np

import pydens_tpu as pdt
from pydens_tpu import Solver, D, HaltonSampler


def main():
    def pde(f, x, y, z):
        lap = D(D(f, x), x) + D(D(f, y), y) + D(D(f, z), z)
        return lap + 3 * np.pi ** 2 * (pdt.sin(np.pi * x)
                                       * pdt.sin(np.pi * y)
                                       * pdt.sin(np.pi * z))

    solver = Solver(pde, ndims=3, boundary_condition=0, seed=0,
                    layout="fa fa f", features=[48, 48, 1],
                    activation="Tanh")
    assert solver._plan_ok
    solver.fit(niters=2500, batch_size=2048, lr=2e-3,
               sampler=HaltonSampler(dim=3), progress=False)

    # Boundary exact at any parameters; interior vs the manufactured field.
    edge = np.linspace(0, 1, 5)
    assert np.max(np.abs(solver.predict(
        np.zeros(5), edge, edge[::-1]))) < 1e-6
    rng = np.random.default_rng(0)
    pts = rng.uniform(size=(2000, 3)).astype(np.float32)
    pred = solver.predict(pts).ravel()
    true = np.prod(np.sin(np.pi * pts), axis=1)
    err = np.max(np.abs(pred - true))
    print(f"max |u - u_exact| over 2000 interior points: {err:.4f}")
    assert err < 0.05, err
    return solver


if __name__ == "__main__":
    main()
