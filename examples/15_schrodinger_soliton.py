"""Nonlinear Schrödinger equation: the bright soliton as a 2-component
real system (complex fields via real/imaginary parts):

    i h_t + h_xx / 2 + |h|^2 h = 0     on x in [-5, 5], t in [0, pi/2]
    h(x, 0) = sech(x)

The exact solution is the standing soliton ``h = sech(x) exp(i t / 2)``.
With h = hr + i hi the system is

    hr_t + hi_xx / 2 + (hr^2 + hi^2) hi = 0      (imag part)
   -hi_t + hr_xx / 2 + (hr^2 + hi^2) hr = 0      (real part)

Feature mix: non-unit ``domain`` with an explicit product sampler (the
default sampler ignores ``domain`` — reference quirk parity), periodic
Fourier embedding in x (sech decays to ~1e-2 at the edges, the classic
PINN treatment of this benchmark), exact vector IC at t = 0, and the
coupled cubic-nonlinear system on the Taylor-plan fast path.

No reference counterpart; same equation-as-callable API
(``/root/reference/pydens/model_torch.py:174-188``) extended to systems.
"""

import numpy as np
import jax.numpy as jnp

from pydens_tpu import Solver, D, NumpySampler as NS


def main():
    def nls(f, x, t):
        hr, hi = f[:, 0:1], f[:, 1:2]
        mag2 = hr * hr + hi * hi
        return (
            D(hr, t) + 0.5 * D(D(hi, x), x) + mag2 * hi,
            -D(hi, t) + 0.5 * D(D(hr, x), x) + mag2 * hr,
        )

    def ic(x):
        return jnp.stack([1.0 / jnp.cosh(x), jnp.zeros_like(x)], axis=-1)

    # periodic_ic_decay=False: the sech tails are ~1.3% of peak at x=+-5,
    # so the wrap probe would (correctly) flag the truncation kink — it is
    # deliberate, standard for solitons, and measured harmless here (the
    # final max-error assert below is the evidence).
    solver = Solver(nls, ndims=2, seed=0,
                    domain=[(-5.0, 5.0), (0.0, float(np.pi / 2))],
                    periodic=(0,), initial_condition=ic,
                    periodic_ic_decay=False,
                    layout="fa fa fa f", features=[48, 48, 48, 2],
                    activation="Tanh")
    assert solver._plan_ok
    sampler = (NS("u", low=-5, high=5, seed=0)
               & NS("u", low=0, high=np.pi / 2, seed=1))
    solver.fit(niters=2500, batch_size=1024, lr=2e-3, sampler=sampler,
               progress=False)
    solver.fit(niters=800, batch_size=2048, lr=3e-4, sampler=sampler,
               progress=False)

    xs = np.linspace(-5, 5, 101)
    for t_eval in (np.pi / 4, np.pi / 2):
        pred = solver.predict(xs, np.full_like(xs, t_eval))
        true_r = np.cos(t_eval / 2) / np.cosh(xs)
        true_i = np.sin(t_eval / 2) / np.cosh(xs)
        err = np.max(np.hypot(pred[:, 0] - true_r, pred[:, 1] - true_i))
        print(f"t={t_eval:.3f}: max |h - h_exact| = {err:.4f}")
        assert err < 0.05, err
    return solver


if __name__ == "__main__":
    main()
