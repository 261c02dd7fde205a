"""Field token: trainable unknown FUNCTIONS for inverse problems.

Generalizes the reference's scalar ``V`` coefficients
(``model_torch.py:180-188``) to spatially-varying ones: the field's MLP
leaves ride the same trainable-variable registry, so optimizer,
checkpointing, freezing and ensembles apply unchanged.  The full
recovery workload lives in examples/22 (suite-run); these tests cover
the machinery.
"""

import numpy as np
import pytest

import pydens_tpu as pdt
from pydens_tpu import Solver, D, Field


def _obs():
    rng = np.random.default_rng(0)
    obs_x = rng.uniform(0, 1, (32, 1)).astype(np.float32)
    return obs_x, np.sin(np.pi * obs_x).astype(np.float32)


def _make_solver(field, **kw):
    obs_x, obs_u = _obs()

    def poisson(f, x):
        return D(D(f, x), x) - field(x)

    return Solver(poisson, ndims=1, seed=0, boundary_condition=0,
                  layout="fa f", features=[16, 1], activation="Tanh",
                  constraints=lambda f, x: f(obs_x) - obs_u, **kw)


def test_validation():
    with pytest.raises(ValueError, match="dot-free"):
        Field("a.b")
    with pytest.raises(RuntimeError, match="Solver context"):
        Field("kappa")(np.zeros((4, 1)))
    sf = Field("s")
    solver = _make_solver(sf)
    assert sf.in_dim == 1
    with pytest.raises(ValueError, match="fixed signature"):
        # reuse with a different arity inside a new solver
        Solver(lambda f, x, t: D(f, t) - sf(x, t), ndims=2, seed=0,
               initial_condition=0.0)
    del solver


def test_leaves_registered_and_checkpoint_roundtrip(tmp_path):
    sf = Field("s", features=[8, 1])
    solver = _make_solver(sf)
    names = {"s.fc1.w", "s.fc1.b", "s.fc2.w", "s.fc2.b"}
    assert names <= set(solver.params["variables"])
    solver.fit(niters=40, batch_size=128, progress=False)
    path = str(tmp_path / "ckpt.npz")
    solver.save(path)

    sf2 = Field("s", features=[8, 1])
    solver2 = _make_solver(sf2)
    solver2.load(path)
    xs = np.linspace(0, 1, 20)
    np.testing.assert_allclose(sf2.predict(solver2, xs),
                               sf.predict(solver, xs), rtol=1e-6)


def test_prefix_freeze():
    sf = Field("s", features=[8, 1])
    solver = _make_solver(sf)
    solver.fit(niters=20, batch_size=128, progress=False)
    solver.model.freeze_trainable(variables=["s"])
    w0 = np.asarray(solver.params["variables"]["s.fc1.w"])
    net0 = np.asarray(solver.params["net"]["fc1"]["w"])
    solver.fit(niters=20, batch_size=128, progress=False)
    np.testing.assert_array_equal(
        np.asarray(solver.params["variables"]["s.fc1.w"]), w0)
    assert not np.array_equal(
        np.asarray(solver.params["net"]["fc1"]["w"]), net0)
    with pytest.raises(AttributeError, match="unknown"):
        solver.model.freeze_trainable(variables=["nope"])
    solver.model.unfreeze_trainable(variables=["s"])


def test_plan_interaction():
    # coefficient form keeps the Taylor plan; divergence form (field
    # inside D) falls back but still trains.
    sf = Field("k", features=[8, 1])
    solver = _make_solver(sf)
    assert solver._plan_ok

    sf2 = Field("k2", features=[8, 1])

    def divergence_form(f, x):
        return D(sf2(x) * D(f, x), x) - 1.0

    s2 = Solver(divergence_form, ndims=1, seed=0, boundary_condition=0,
                layout="fa f", features=[16, 1], activation="Tanh")
    assert not s2._plan_ok
    s2.fit(niters=30, batch_size=128, progress=False)
    assert np.isfinite(s2.losses).all()


def test_field_with_ensemble():
    # ensemble solvers stack variable leaves along a model axis; the field
    # must train per-model and predict the ensemble mean / std
    sf = Field("s", features=[8, 1])
    solver = _make_solver(sf, n_models=3)
    assert np.asarray(solver.params["variables"]["s.fc1.w"]).shape == (3, 1, 8)
    solver.fit(niters=40, batch_size=128, progress=False)
    xs = np.linspace(0, 1, 11)
    per_model = sf.predict_all(solver, xs)
    assert per_model.shape == (3, 11, 1)
    # members start identical but diverge through their different nets
    assert not np.allclose(per_model[0], per_model[1])
    np.testing.assert_allclose(sf.predict(solver, xs),
                               per_model.mean(axis=0), rtol=1e-6)
    assert sf.predict_std(solver, xs).shape == (11, 1)
    # non-ensemble predict_std raises
    sf1 = Field("s1", features=[8, 1])
    s1 = _make_solver(sf1)
    with pytest.raises(ValueError, match="n_models"):
        sf1.predict_std(s1, xs)


def test_field_of_two_coordinates():
    sf = Field("q", features=[8, 1])

    def pde(f, x, t):
        return D(f, t) - 0.1 * D(D(f, x), x) - sf(x, t)

    solver = Solver(pde, ndims=2, seed=0, initial_condition=0.0,
                    layout="fa f", features=[16, 1], activation="Tanh")
    assert sf.in_dim == 2
    solver.fit(niters=30, batch_size=128, progress=False)
    out = sf.predict(solver, np.linspace(0, 1, 9), 0.5)
    assert out.shape == (9, 1)
