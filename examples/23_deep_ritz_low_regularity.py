"""Deep Ritz on a low-regularity problem: discontinuous source.

    -u''(x) = f(x),  u(0) = u(1) = 0,
     f(x)   = +1 for x < 1/2,  -1 for x > 1/2.

The weak solution is the piecewise quadratic

    u(x) = -x²/2 + x/4          (x ≤ 1/2)
         =  x²/2 - 3x/4 + 1/4   (x ≥ 1/2)

— C¹ but not C²: u'' jumps at x = 1/2.  A strong-form PINN asks a smooth
network's second derivative to match that jump pointwise, which it
cannot; the Deep Ritz energy (``Solver(formulation='variational')``)

    E[u] = ∫ ½ u'² - f·u dx

samples only u and u', so the network never has to represent the jump.
The exact-boundary ansatz supplies the admissible set — no boundary
penalty, the term the original Deep Ritz method needs.  No reference
counterpart (pydens trains strong-form residuals only,
``model_torch.py:396-410``).

The recipe matters (all measured, CPU, seed 0, identical budgets):
the energy integrand does NOT vanish at the optimum, so plain-MC
minibatch gradients carry O(1/√N) noise forever — Adam alone plateaus
at 27% rel-L2.  Quasi-Monte-Carlo collocation (HaltonSampler,
integration error ~O(1/N)) plus a FIXED-batch L-BFGS finish
(deterministic objective → the zoom linesearch works) takes the
variational solve to **0.08% rel-L2**, while the strong form with the
exact same sampler/optimizer budget plateaus at 1.6% — the C²
obstruction L-BFGS cannot fix.  ~20x.
"""

import numpy as np

import pydens_tpu as pdt
from pydens_tpu import Solver, D
from pydens_tpu.samplers import HaltonSampler


def u_true(xs):
    return np.where(xs <= 0.5, -xs ** 2 / 2 + xs / 4,
                    xs ** 2 / 2 - 3 * xs / 4 + 0.25)


def main():
    import jax.numpy as jnp
    source = pdt.lift(lambda z: jnp.sign(0.5 - z))  # +1 left, -1 right

    def energy(f, x):
        return 0.5 * D(f, x) ** 2 - source(x) * f

    def residual(f, x):
        return D(D(f, x), x) + source(x)

    common = dict(ndims=1, seed=0, boundary_condition=0,
                  layout="fa fa f", features=[24, 24, 1], activation="Tanh")
    xs = np.linspace(0, 1, 401)
    truth = u_true(xs)
    rel = {}
    for name, eq, kw in [("variational", energy,
                          {"formulation": "variational"}),
                         ("residual", residual, {})]:
        solver = Solver(eq, **common, **kw)
        qmc = HaltonSampler(dim=1)
        solver.fit(niters=4000, batch_size=2048, lr=5e-3, sampler=qmc,
                   progress=False)
        solver.fit(niters=500, batch_size=4096, optimizer="LBFGS",
                   sampler=qmc, resample=False, progress=False)
        pred = solver.predict(xs).ravel()
        rel[name] = np.linalg.norm(pred - truth) / np.linalg.norm(truth)
    print(f"rel-L2 vs weak solution: variational {rel['variational']:.5f}  "
          f"residual {rel['residual']:.5f}")
    assert rel["variational"] < 0.005, rel
    assert rel["variational"] < rel["residual"] / 3, rel
    return rel


if __name__ == "__main__":
    main()
