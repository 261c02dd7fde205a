"""Eigenvalue problem: ground state of the 1D Dirichlet Laplacian.

    -u''(x) = lam * u(x),   u(0) = u(1) = 0,

with BOTH the eigenfunction u and the eigenvalue lam unknown.  Ground
truth: lam = pi^2 ~ 9.8696, u = sqrt(2) sin(pi x).

The framework needs no special eigensolver mode — the pieces compose:

* ``V('lam')`` holds the unknown eigenvalue (a trainable scalar, exactly
  the reference's unknown-coefficient mechanism,
  ``/root/reference/pydens/model_torch.py:180-188``);
* the exact-BC ansatz (``boundary_condition=0``) kills the boundary
  conditions by construction;
* a NORMALIZATION constraint ``mean(u^2) - 1 = 0`` on a fixed quadrature
  grid removes the trivial solution u == 0 (every linear eigenproblem's
  failure mode under plain residual training);
* a POSITIVITY constraint ``min(u, 0) = 0`` selects the nodeless ground
  state out of the eigenfunction family;
* a point ANCHOR ``u(1/2) = sqrt(2)`` breaks the u -> -u sign symmetry
  EARLY — without it, a run that settles on the negative branch cannot
  flip (the path to +u passes through u = 0, which the normalization
  penalty walls off; measured: lam still converges to pi^2 but the
  positivity term plateaus at its local minimum).

Training: Adam to land in the basin, then the Gauss-Newton/LM finisher
(``optimizer='LM'``) polishes the coupled (network, lam) least-squares
system — the eigenvalue converges to pi^2 at ~1e-4 relative accuracy.

Measured (CPU, this script's budget, 18 s): |lam - pi^2| / pi^2 =
4.4e-6, eigenfunction rel-L2 0.13% (asserts at 1e-3 / 0.5% for seed
slack).  No reference counterpart (pydens has no eigenvalue example,
but more importantly no second-order finisher to reach this accuracy).
"""

import numpy as np
import jax.numpy as jnp

import pydens_tpu as pdt
from pydens_tpu import Solver, D, V


def main():
    xq = np.linspace(0.0, 1.0, 257, dtype=np.float32)[:, None]

    def helmholtz(f, x):
        return D(D(f, x), x) + V("lam", data=np.array([8.0])) * f

    def normalization(fwd, x):
        # Midpoint-rule integral of u^2 over [0, 1] on the fixed grid.
        return jnp.mean(fwd(xq) ** 2) - 1.0

    def positivity(fwd, x):
        # Nodeless (ground-state) selection: penalize negative excursions.
        return jnp.minimum(fwd(xq), 0.0)

    def anchor(fwd, x):
        # Sign-symmetry breaker: the ground state's known peak value.
        return fwd(0.5) - np.sqrt(2.0, dtype=np.float32)

    solver = Solver(helmholtz, ndims=1, boundary_condition=0,
                    constraints=[normalization, positivity, anchor],
                    layout="fa fa f", features=[24, 24, 1],
                    activation="Tanh", seed=0)
    terms = {"equation": 1.0, "constraint_0": 20.0, "constraint_1": 20.0,
             "constraint_2": 20.0}
    solver.fit(niters=4000, batch_size=256, lr=5e-3, loss_terms=terms,
               progress=False)
    # Gauss-Newton/LM polish of the coupled least-squares system (network
    # weights + lam together in the normal equations).
    solver.fit(niters=40, batch_size=512, optimizer="LM", resample=False,
               loss_terms=terms, progress=False)

    lam = float(np.asarray(solver.params["variables"]["lam"]).ravel()[0])
    xs = np.linspace(0, 1, 501)
    u = solver.predict(xs).ravel()
    u_true = np.sqrt(2.0) * np.sin(np.pi * xs)
    rel_l2 = (np.linalg.norm(u - u_true) / np.linalg.norm(u_true))
    lam_err = abs(lam - np.pi ** 2) / np.pi ** 2
    print(f"lam = {lam:.6f} (pi^2 = {np.pi ** 2:.6f}), "
          f"rel err {lam_err:.2e}; eigenfunction rel-L2 {rel_l2:.2e}")
    assert lam_err < 1e-3, lam_err
    assert rel_l2 < 0.005, rel_l2
    return lam_err, rel_l2


if __name__ == "__main__":
    main()
