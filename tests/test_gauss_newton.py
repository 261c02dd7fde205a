"""Levenberg-Marquardt / Gauss-Newton optimizer tests.

A superset of the reference (its optimizer registry is torch.optim by name,
``model_torch.py:419-422`` — torch has no Gauss-Newton).  The LM update
solves the damped normal equations (JᵀJ + λI) d = Jᵀr matrix-free by CG
inside the compiled training loop; because the residual vector is scaled so
that ``loss == ||r||²`` exactly, a step is accepted only when it reduces the
training loss — on a fixed batch the recorded loss sequence is monotone
non-increasing by construction.
"""

import numpy as np
import pytest

import pydens_tpu as pdt
from pydens_tpu import Solver, D, V


def _ode(f, x):
    return D(f, x) - 2 * np.pi * pdt.cos(2 * np.pi * x)


def test_lm_finishing_phase_goes_orders_deeper_than_adam():
    solver = Solver(_ode, ndims=1, initial_condition=.5, activation="Tanh",
                    layout="fafaf", features=[12, 10, 1], seed=0)
    solver.fit(niters=300, batch_size=512, lr=0.02, progress=False)
    adam_loss = solver.losses[-1]
    solver.fit(niters=40, batch_size=512, optimizer="LM",
               resample=False, progress=False)
    lm_loss = solver.losses[-1]
    assert lm_loss < 1e-2 * adam_loss  # orders of magnitude, not percent
    # Measured floor ~8e-7: the best-fit residual of the overdetermined
    # 512-point system at this net size (cg_iters=150/tol=1e-8 reaches
    # 6.9e-7 — CG truncation is not the limiter), i.e. ~450x below Adam.
    assert lm_loss < 2e-6
    xs = np.linspace(0, 1, 100)
    err = np.max(np.abs(solver.predict(xs).ravel()
                        - (np.sin(2 * np.pi * xs) + .5)))
    assert err < 5e-3


def test_lm_fixed_batch_loss_is_monotone_nonincreasing():
    solver = Solver(_ode, ndims=1, initial_condition=.5, seed=1)
    solver.fit(niters=25, batch_size=128, optimizer="GaussNewton",
               resample=False, progress=False)
    losses = np.asarray(solver.losses)
    assert np.all(np.diff(losses) <= 1e-12)
    assert losses[-1] < losses[0]


def test_lm_with_weighted_constraint_and_variable():
    # Inverse problem: V in the IC, pinned by a weighted constraint — the
    # normal equations couple the network weights and the V leaf.
    def ode(f, x):
        return D(f, x) - 2 * np.pi * pdt.cos(2 * np.pi * x)

    def constraint(fwd, x):
        return fwd(0.5) - 0.7  # true sin(pi) + init = init -> init = 0.7

    def initial(*args):
        return V("init", data=np.array([0.1]))

    solver = Solver(ode, ndims=1, initial_condition=initial,
                    constraints=constraint, seed=0)
    solver.fit(niters=200, batch_size=256, lr=0.02, progress=False,
               loss_terms={"equation": 1.0, "constraint_0": 5.0})
    solver.fit(niters=30, batch_size=256, optimizer="LM", resample=False,
               loss_terms={"equation": 1.0, "constraint_0": 5.0},
               progress=False)
    # Overdetermined-LSQ floor again (see the first test): measured 9.2e-7.
    assert solver.losses[-1] < 5e-6
    init = float(
        np.asarray(solver.model.params["variables"]["init"]).ravel()[0])
    assert abs(init - 0.7) < 5e-3


def test_lm_ensemble_per_member_damping():
    solver = Solver(_ode, ndims=1, initial_condition=.5, n_models=2, seed=2)
    solver.fit(niters=20, batch_size=128, optimizer="LM", resample=False,
               progress=False)
    losses = np.asarray(solver.losses)
    assert losses[-1] < losses[0]
    # Per-member damping state: one (λ, ν) pair per ensemble member.
    assert np.shape(solver._opt_state) == (2, 2)


def test_lm_respects_frozen_parameters():
    solver = Solver(_ode, ndims=1, initial_condition=.5, seed=0)
    solver.fit(niters=5, batch_size=64, progress=False)  # materialize params
    before = np.array(solver.model.params["net"]["fc1"]["w"])
    solver.model.freeze_trainable(layers=["fc1"])
    solver.fit(niters=10, batch_size=128, optimizer="LM", resample=False,
               progress=False)
    after = np.array(solver.model.params["net"]["fc1"]["w"])
    np.testing.assert_array_equal(before, after)
    losses = np.asarray(solver.losses[5:])
    assert losses[-1] < losses[0]  # still trains the unfrozen subspace
    solver.model.unfreeze_trainable(layers=["fc1"])


def test_lm_warm_reuse_keeps_damping_state():
    solver = Solver(_ode, ndims=1, initial_condition=.5, seed=3)
    solver.fit(niters=10, batch_size=128, optimizer="LM", resample=False,
               progress=False)
    lam_after_first = float(np.asarray(solver._opt_state)[0])
    assert lam_after_first != pytest.approx(1e-3)  # damping adapted
    solver.fit(niters=5, batch_size=128, optimizer=None, resample=False,
               progress=False)
    assert len(solver.losses) == 15


def test_lm_rejects_incompatible_modes():
    solver = Solver(_ode, ndims=1, initial_condition=.5, seed=0)
    with pytest.raises(ValueError, match="MSE"):
        solver.fit(niters=2, batch_size=32, optimizer="LM",
                   criterion="L1Loss", progress=False)
    with pytest.raises(ValueError, match="causal"):
        solver.fit(niters=2, batch_size=32, optimizer="LM", causal=1.0,
                   progress=False)
    with pytest.raises(ValueError, match="adaptive"):
        solver.fit(niters=2, batch_size=32, optimizer="LM", adaptive=2,
                   progress=False)
    with pytest.raises(ValueError, match="rba|adaptive"):
        solver.fit(niters=2, batch_size=32, optimizer="LM", rba=True,
                   resample=False, progress=False)

    def energy(f, x):
        return 0.5 * D(f, x) ** 2

    vsolver = Solver(energy, ndims=1, boundary_condition=0,
                     formulation="variational", seed=0)
    with pytest.raises(ValueError, match="variational|least-squares"):
        vsolver.fit(niters=2, batch_size=32, optimizer="LM", progress=False)

    def two_terms(fwd, x):
        return fwd(0.5)

    csolver = Solver(_ode, ndims=1, initial_condition=.5,
                     constraints=two_terms, seed=0)
    with pytest.raises(ValueError, match="loss_balancing|balancing"):
        csolver.fit(niters=2, batch_size=32, optimizer="LM",
                    loss_terms=["equation", "constraint_0"],
                    loss_balancing=True, progress=False)


def test_lm_optimizer_kwargs_and_aliases():
    solver = Solver(_ode, ndims=1, initial_condition=.5, seed=0)
    solver.fit(niters=5, batch_size=64, optimizer="levenberg-marquardt",
               resample=False, cg_iters=20, init_damping=1e-2,
               progress=False)
    assert len(solver.losses) == 5
    with pytest.raises(ValueError, match="cg_iters"):
        from pydens_tpu.utils.optimizers import LMConfig
        LMConfig(cg_iters=0)


def test_lm_separable_grid_training():
    from pydens_tpu import SeparableModel

    def poisson(f, x, y):
        return D(D(f, x), x) + D(D(f, y), y) + 2 * (np.pi ** 2) * pdt.sin(
            np.pi * x) * pdt.sin(np.pi * y)

    solver = Solver(poisson, ndims=2, boundary_condition=0,
                    model=SeparableModel, seed=0)
    solver.fit(niters=15, batch_size=24, optimizer="LM", resample=False,
               progress=False)
    losses = np.asarray(solver.losses)
    assert np.all(np.diff(losses) <= 1e-12)
    assert losses[-1] < losses[0]


def test_lm_mesh_matches_single_device():
    # Data-parallel LM: J·v / Jᵀ·u matvecs run over the batch-sharded
    # residual (XLA inserts the psum inside every CG iteration); the CG
    # solve itself operates on replicated theta vectors.  Same seed, same
    # fixed batch — the 8-device trajectory must match 1-device to f32
    # reduction-order noise (CG is iterative, so tolerance is looser than
    # the Adam-path equivalence test).
    from pydens_tpu.parallel import make_mesh
    kwargs = dict(ndims=1, initial_condition=.5, seed=0)
    s1 = Solver(_ode, **kwargs)
    s1.fit(niters=10, batch_size=128, optimizer="LM", resample=False,
           progress=False)
    s2 = Solver(_ode, mesh=make_mesh(), **kwargs)
    s2.fit(niters=10, batch_size=128, optimizer="LM", resample=False,
           progress=False)
    l1, l2 = np.asarray(s1.losses), np.asarray(s2.losses)
    np.testing.assert_allclose(l1, l2, rtol=1e-3, atol=1e-8)
