"""NTK-trace loss balancing on a high-frequency Helmholtz equation —
the regime where the balancing STATISTIC matters.

    u'' + k^2 u = 0,   u(0) = 0,   u'(0) = k,   k = 12   on x in [0, 1]

with PENALTY initial conditions (constraints, not the bound ansatz), so
the fit carries three loss terms whose natural scales differ by O(k^4).
Exact solution: ``u = sin(k x)``.

Why ``loss_balancing='ntk'`` here: the equation residual of an
oscillatory solution OSCILLATES per collocation point, so the
batch-summed gradient magnitude that the default ``'grad'`` statistic
reads partially cancels toward zero and under-weights the equation's
true stiffness.  The NTK trace ``tr(K_j) = ||d r_j / d theta||_F^2``
(Wang/Yu/Perdikaris, arXiv 2007.14527 §4: ``lambda_j ∝ 1/tr(K_j)``)
sums per-ROW Jacobian norms — no sign cancellation — and sets the truer
scale: measured median max-err 0.012 ('ntk') vs 0.0215 ('grad') vs 0.19
(unbalanced) over 3 seeds (BENCHMARKS.md "NTK-trace loss balancing";
the plain mis-scaled beam, where per-point gradients agree in sign,
slightly favors ``'grad'`` — the two statistics are complementary).

The trace is Hutchinson-estimated with residual-space Rademacher probes
through ONE shared vjp pullback; terms with ≤ 4 residual rows (the two
pointwise ICs here) are enumerated exactly.  Same anchor/clip/EMA
policy as the default mode, so only the statistic changes.

Reference context: the reference framework has no loss balancing at all
(``/root/reference/pydens/model_torch.py`` — static ``loss_terms``
weights only); both modes are TPU-native supersets.
"""

import numpy as np

from pydens_tpu import D, Solver

K = 12.0


def main():
    zero = np.array([0.0], np.float32)

    solver = Solver(lambda f, x: D(D(f, x), x) + K * K * f,
                    ndims=1, seed=0,
                    layout="fa fa fa f", features=[48, 48, 48, 1],
                    activation="Tanh",
                    constraints=(lambda f, x: f(zero),
                                 lambda f, x: f.grad(zero, wrt=0) - K))

    solver.fit(niters=4000, batch_size=1024, lr=0.002,
               loss_terms={"equation": 1.0, "constraint_0": 1.0,
                           "constraint_1": 1.0},
               loss_balancing="ntk", progress=False)

    wts = np.asarray(solver.history[-1]["balanced_weights"])
    print(f"balanced weights: {np.round(wts, 3)}")
    assert wts[0] == 1.0  # the equation term anchors the scale
    assert np.all(np.isfinite(wts)) and np.all(wts > 0)

    xs = np.linspace(0.0, 1.0, 201)
    err = float(np.max(np.abs(solver.predict(xs).ravel() - np.sin(K * xs))))
    print(f"max err vs sin(kx): {err:.4f}")
    assert err < 0.03  # seed-0 measured 0.0046; unbalanced stalls at ~0.19
    return solver


if __name__ == "__main__":
    main()
