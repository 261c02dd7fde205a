"""Flax linen module as the PINN network body."""

import numpy as np
import pytest

flax = pytest.importorskip("flax")
import flax.linen as nn  # noqa: E402

import pydens_tpu as pdt  # noqa: E402
from pydens_tpu import Solver, D  # noqa: E402
from pydens_tpu.models.flax_adapter import flax_model  # noqa: E402


class Net(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.tanh(nn.Dense(24)(x))
        x = nn.tanh(nn.Dense(24)(x))
        return nn.Dense(1)(x)


def test_flax_model_solves_ode():
    def ode(f, x):
        return D(f, x) - 2 * np.pi * pdt.cos(2 * np.pi * x)

    solver = Solver(ode, ndims=1, initial_condition=.5,
                    model=flax_model(Net()), seed=0)
    solver.fit(niters=500, batch_size=400, lr=0.01, progress=False)
    xs = np.linspace(0, 1, 50)
    err = np.max(np.abs(solver.predict(xs).ravel()
                        - (np.sin(2 * np.pi * xs) + .5)))
    assert err < 0.08


def test_flax_model_freeze_by_layer_name():
    def ode(f, x):
        return D(f, x) - 1.0

    solver = Solver(ode, ndims=1, model=flax_model(Net()), seed=0)
    assert "Dense_0" in solver.params["net"]
    w = np.asarray(solver.params["net"]["Dense_0"]["kernel"]).copy()
    solver.model.freeze_trainable(layers=["Dense_0"])
    solver.fit(niters=30, batch_size=64, progress=False)
    np.testing.assert_allclose(
        np.asarray(solver.params["net"]["Dense_0"]["kernel"]), w)


def test_flax_model_with_ensemble_and_checkpoint(tmp_path):
    def ode(f, x):
        return D(f, x) - 1.0

    solver = Solver(ode, ndims=1, model=flax_model(Net()), seed=0,
                    n_models=2)
    solver.fit(niters=20, batch_size=64, progress=False)
    path = str(tmp_path / "flax.msgpack")
    solver.save(path)
    s2 = Solver(ode, ndims=1, model=flax_model(Net()), seed=9, n_models=2)
    s2.load(path)
    np.testing.assert_allclose(s2.predict([0.3]), solver.predict([0.3]),
                               rtol=1e-6)


def test_flax_stateful_module_rejected():
    class BNNet(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Dense(8)(x)
            x = nn.BatchNorm(use_running_average=True)(x)
            return nn.Dense(1)(x)

    def ode(f, x):
        return D(f, x)

    with pytest.raises(ValueError, match="collections"):
        Solver(ode, ndims=1, model=flax_model(BNNet()), seed=0)