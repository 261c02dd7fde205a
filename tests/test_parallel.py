"""Data-parallel mesh tests on the 8-virtual-device CPU backend
(SURVEY §2 'Parallelism' — DP over the collocation batch is the parallelism
this problem class needs; gradients all-reduce via XLA-inserted psum)."""

import jax
import numpy as np
import pytest

import pydens_tpu as pdt
from pydens_tpu import Solver, D, NumpySampler as NS
from pydens_tpu.parallel import make_mesh


def _ode(f, x):
    return D(f, x) - 2 * np.pi * pdt.cos(2 * np.pi * x)


def test_eight_virtual_devices_present():
    assert len(jax.devices()) == 8


def test_mesh_fit_runs_and_converges():
    mesh = make_mesh()
    solver = Solver(_ode, ndims=1, initial_condition=.5, mesh=mesh, seed=0,
                    activation="Tanh", layout="fafaf", features=[12, 10, 1])
    solver.fit(niters=400, batch_size=512, lr=0.02, progress=False)
    assert solver.losses[-1] < 1e-2
    xs = np.linspace(0, 1, 50)
    err = np.max(np.abs(solver.predict(xs).ravel()
                        - (np.sin(2 * np.pi * xs) + .5)))
    assert err < 0.1


def test_mesh_batch_divisibility_check():
    mesh = make_mesh()
    solver = Solver(_ode, ndims=1, mesh=mesh, seed=0)
    with pytest.raises(ValueError, match="divisible"):
        solver.fit(niters=1, batch_size=100, progress=False)


def test_mesh_with_device_sampler():
    mesh = make_mesh()
    sampler = NS("u") & NS("u", low=1, high=5)
    solver = Solver(lambda f, x, e: D(f, x) - e, ndims=1, nparams=1,
                    initial_condition=0.0, mesh=mesh, seed=0)
    solver.fit(niters=20, batch_size=64, sampler=sampler, progress=False)
    assert np.isfinite(solver.losses).all()


def test_mesh_with_host_sampler():
    from pydens_tpu.samplers import ScipySampler
    mesh = make_mesh()
    solver = Solver(_ode, ndims=1, initial_condition=.5, mesh=mesh, seed=0)
    solver.fit(niters=10, batch_size=64,
               sampler=ScipySampler("uniform", seed=0), progress=False)
    assert np.isfinite(solver.losses).all()


def test_mesh_subset_of_devices():
    mesh = make_mesh(4)
    assert mesh.size == 4
    with pytest.raises(ValueError, match="available"):
        make_mesh(100)


def test_2d_mesh_ensemble_times_data_parallel():
    # 2x4 mesh: 4 ensemble members sharded 2-way over 'models', batch
    # sharded 4-way over 'data' — composed parallelism in one step.
    mesh = make_mesh(shape=(2, 4), axis_names=("models", "data"))
    solver = Solver(_ode, ndims=1, initial_condition=.5, mesh=mesh, seed=0,
                    n_models=4, activation="Tanh", layout="fafaf",
                    features=[12, 10, 1])
    solver.fit(niters=200, batch_size=256, lr=0.02, progress=False)
    assert solver.losses[-1] < 0.05
    assert solver.predict_all(np.linspace(0, 1, 9)).shape == (4, 9, 1)
    std = solver.predict_std(np.linspace(0, 1, 9))
    assert np.isfinite(std).all()


def test_2d_mesh_divisibility_checks():
    mesh = make_mesh(shape=(2, 4), axis_names=("models", "data"))
    solver = Solver(_ode, ndims=1, mesh=mesh, seed=0, n_models=3)
    with pytest.raises(ValueError, match="n_models=3"):
        solver.fit(niters=1, batch_size=8, progress=False)
    solver2 = Solver(_ode, ndims=1, mesh=mesh, seed=0, n_models=2)
    with pytest.raises(ValueError, match="'data' mesh axis"):
        solver2.fit(niters=1, batch_size=10, progress=False)


def test_make_mesh_shape_validation():
    with pytest.raises(ValueError, match="axis_names"):
        make_mesh(shape=(2, 4))
    with pytest.raises(ValueError, match="devices"):
        make_mesh(shape=(4, 4), axis_names=("models", "data"))


def test_mesh_matches_single_device_loss_scale():
    # Same seed, same config: mesh vs no-mesh runs should see losses of the
    # same magnitude (identical math, different layout).
    kwargs = dict(ndims=1, initial_condition=.5, seed=0,
                  activation="Tanh", layout="fafaf", features=[12, 10, 1])
    s1 = Solver(_ode, **kwargs)
    s1.fit(niters=100, batch_size=256, lr=0.02, progress=False)
    s2 = Solver(_ode, mesh=make_mesh(), **kwargs)
    s2.fit(niters=100, batch_size=256, lr=0.02, progress=False)
    np.testing.assert_allclose(s1.losses[-1], s2.losses[-1], rtol=0.5)
