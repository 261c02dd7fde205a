"""Unknown-FIELD inverse problem: recover a spatially-varying source.

    u''(x) = s(x),   u(0) = u(1) = 0,

where the source field s(x) is UNKNOWN — only scattered observations of
the solution u are available.  The true field is s = -π² sin(πx)
(so u = sin(πx)).  ``Field('s')`` parameterizes the unknown function by
its own small MLP whose weights train jointly with the solution network
— the function-valued generalization of the reference's scalar ``V``
coefficients (``/root/reference/pydens/model_torch.py:180-188``; see
also examples/05 and /10 for the scalar cases).

The field's leaves live in ``solver.params['variables']``
(``s.fc1.w``, ...), so checkpointing, two-phase freezing
(``freeze_trainable(variables=['s'])`` — prefix covers the whole
field) and the rest of the training machinery apply unchanged.

Measured (CPU, this script's budget): recovered field rel-L2 2.5%
against -π² sin(πx), solution max err 4e-4.  No reference counterpart
(pydens cannot express function-valued unknowns).
"""

import numpy as np

import pydens_tpu as pdt
from pydens_tpu import Solver, D, Field


def main():
    rng = np.random.default_rng(0)
    obs_x = rng.uniform(0, 1, (64, 1)).astype(np.float32)
    obs_u = np.sin(np.pi * obs_x).astype(np.float32)  # noiseless here

    s_field = Field("s", features=[16, 1])

    def poisson(f, x):
        return D(D(f, x), x) - s_field(x)

    def data_misfit(f, x):
        return f(obs_x) - obs_u

    solver = Solver(poisson, ndims=1, seed=0, boundary_condition=0,
                    layout="fa fa f", features=[24, 24, 1],
                    activation="Tanh", constraints=data_misfit)
    # Two stages: fit the solution hard against the data, then anneal the
    # learning rate so the field (read only through u'' = s) sharpens.
    solver.fit(niters=10000, batch_size=256, lr=5e-3,
               loss_terms={"equation": 1.0, "constraint_0": 1000.0},
               progress=False)
    solver.fit(niters=20000, batch_size=256, lr=1e-3,
               loss_terms={"equation": 1.0, "constraint_0": 1000.0},
               progress=False)

    xs = np.linspace(0, 1, 100)
    s_hat = s_field.predict(solver, xs).ravel()
    s_true = -np.pi ** 2 * np.sin(np.pi * xs)
    rel_s = np.linalg.norm(s_hat - s_true) / np.linalg.norm(s_true)
    err_u = np.max(np.abs(solver.predict(xs).ravel() - np.sin(np.pi * xs)))
    print(f"recovered field rel L2: {rel_s:.4f}  "
          f"(max |s| = {np.pi**2:.1f}); solution max err: {err_u:.5f}")
    assert rel_s < 0.06, rel_s
    assert err_u < 0.005, err_u
    return solver


if __name__ == "__main__":
    main()
