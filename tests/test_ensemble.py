"""Ensemble training (vmapped multi-model fits) — a TPU-native superset of
the reference (no counterpart; small PINN nets underutilize the chip, so an
ensemble is nearly free and yields epistemic uncertainty)."""

import numpy as np
import pytest

import pydens_tpu as pdt
from pydens_tpu import Solver, D, V


def _ode(f, x):
    return D(f, x) - 2 * np.pi * pdt.cos(2 * np.pi * x)


def test_ensemble_trains_and_predicts():
    K = 4
    solver = Solver(_ode, ndims=1, initial_condition=.5, activation="Tanh",
                    layout="fafaf", features=[12, 10, 1], seed=0, n_models=K)
    assert solver.params["net"]["fc1"]["w"].shape[0] == K
    solver.fit(niters=400, batch_size=256, lr=0.02, progress=False)
    xs = np.linspace(0, 1, 50)
    mean = solver.predict(xs)
    assert mean.shape == (50, 1)
    allp = solver.predict_all(xs)
    assert allp.shape == (K, 50, 1)
    std = solver.predict_std(xs)
    assert std.shape == (50, 1)
    # members differ (independent inits) but all converge near the truth
    assert np.std(allp[:, 25, 0]) > 0
    err = np.max(np.abs(mean.ravel() - (np.sin(2 * np.pi * xs) + .5)))
    assert err < 0.1
    assert std.mean() < 0.2


def test_ensemble_members_independent():
    K = 3
    solver = Solver(_ode, ndims=1, seed=0, n_models=K)
    w = np.asarray(solver.params["net"]["fc1"]["w"])
    # different initializations per member
    assert not np.allclose(w[0], w[1])
    solver.fit(niters=20, batch_size=64, progress=False)
    w2 = np.asarray(solver.params["net"]["fc1"]["w"])
    assert not np.allclose(w, w2)


def test_ensemble_v_variables_per_model():
    def odevar(f, x):
        return D(f, x) + V("c", data=np.array([1.0]))

    solver = Solver(odevar, ndims=1, seed=0, n_models=3)
    assert solver.params["variables"]["c"].shape == (3, 1)
    solver.fit(niters=30, batch_size=64, progress=False)
    assert np.isfinite(solver.losses).all()


def test_ensemble_freeze_and_reset():
    solver = Solver(_ode, ndims=1, seed=0, n_models=2)
    solver.model.freeze_trainable(layers=["fc1"])
    w = np.asarray(solver.params["net"]["fc1"]["w"]).copy()
    solver.fit(niters=20, batch_size=64, progress=False)
    np.testing.assert_allclose(
        np.asarray(solver.params["net"]["fc1"]["w"]), w)
    solver.reset(seed=5)
    assert solver.params["net"]["fc1"]["w"].shape[0] == 2
    assert solver.losses == []


def test_ensemble_lbfgs_polish():
    # Per-model linesearch: the whole L-BFGS update vmaps over the
    # ensemble axis, so each member picks its own step size.  The polish
    # must deepen the (mean) loss well beyond the Adam phase for every
    # member.
    solver = Solver(_ode, ndims=1, initial_condition=.5, seed=0, n_models=3,
                    activation="Tanh", layout="fafaf", features=[16, 12, 1])
    solver.fit(niters=600, batch_size=256, lr=0.01, progress=False)
    adam_loss = solver.losses[-1]
    solver.fit(niters=120, batch_size=1024, optimizer="LBFGS",
               resample=False, progress=False)
    assert solver.losses[-1] < adam_loss * 0.5
    xs = np.linspace(0, 1, 51)
    per_member = solver.predict_all(xs)  # (3, 51, 1)
    true = np.sin(2 * np.pi * xs) + .5
    for k in range(3):
        assert np.max(np.abs(per_member[k, :, 0] - true)) < 0.02


def test_single_model_predict_all_shape():
    solver = Solver(_ode, ndims=1, seed=0)
    assert solver.predict_all(np.linspace(0, 1, 5)).shape == (1, 5, 1)
    with pytest.raises(ValueError, match="n_models"):
        solver.predict_std(np.linspace(0, 1, 5))


def test_ensemble_checkpoint_roundtrip(tmp_path):
    path = str(tmp_path / "ens.msgpack")
    s1 = Solver(_ode, ndims=1, seed=0, n_models=2)
    s1.fit(niters=30, batch_size=64, progress=False)
    preds = s1.predict_all(np.linspace(0, 1, 9))
    s1.save(path)
    s2 = Solver(_ode, ndims=1, seed=7, n_models=2)
    s2.load(path)
    np.testing.assert_allclose(s2.predict_all(np.linspace(0, 1, 9)), preds,
                               rtol=1e-6)
