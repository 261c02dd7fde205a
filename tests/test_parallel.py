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
    with pytest.raises(ValueError, match=r"data mesh axes \('data',\)"):
        solver2.fit(niters=1, batch_size=10, progress=False)


def test_make_mesh_shape_validation():
    with pytest.raises(ValueError, match="axis_names"):
        make_mesh(shape=(2, 4))
    with pytest.raises(ValueError, match="devices"):
        make_mesh(shape=(4, 4), axis_names=("models", "data"))


def test_mesh_matches_single_device_numerically():
    # Same seed, same config: the 8-device data-parallel run must compute
    # THE SAME math as the single-device run — identical sampled points
    # (sharding never changes values), so the whole loss trajectory and the
    # trained solution agree to f32 reduction-order noise.  A silently
    # replicated batch (dropped sharding constraint) would still pass this,
    # which is why test_mesh_step_contains_all_reduce exists alongside it.
    kwargs = dict(ndims=1, initial_condition=.5, seed=0,
                  activation="Tanh", layout="fafaf", features=[12, 10, 1])
    s1 = Solver(_ode, **kwargs)
    s1.fit(niters=100, batch_size=256, lr=0.02, progress=False)
    s2 = Solver(_ode, mesh=make_mesh(), **kwargs)
    s2.fit(niters=100, batch_size=256, lr=0.02, progress=False)
    # measured: max rel diff ~4e-6 over the 100-iteration trajectory
    np.testing.assert_allclose(s1.losses, s2.losses, rtol=1e-4, atol=1e-6)
    xs = np.linspace(0, 1, 50)
    np.testing.assert_allclose(s1.predict(xs), s2.predict(xs), atol=1e-5)


def test_two_axis_data_mesh_shards_over_the_product():
    # A ('dcn', 'data') 2x4 mesh models two 4-chip slices joined by a
    # slower interconnect.  The batch must shard over the PRODUCT of all
    # non-model axes — _mesh_axes returning only the FIRST data axis would
    # silently leave 'data' unused (replicated), an invisible 4x loss of
    # parallelism.  Proven three ways: the resolved axes tuple, an
    # 8-way host-batch shard shape, and the mesh==single-device loss
    # trajectory (sharding never changes values).
    from jax.sharding import NamedSharding, PartitionSpec as P
    from pydens_tpu.solver import _mesh_axes

    mesh = make_mesh(shape=(2, 4), axis_names=("dcn", "data"))
    data_axes, model_axis = _mesh_axes(mesh, 1)
    assert data_axes == ("dcn", "data") and model_axis is None
    x = jax.device_put(np.zeros((1, 64, 1), np.float32),
                       NamedSharding(mesh, P(None, data_axes, None)))
    assert x.addressable_shards[0].data.shape == (1, 8, 1)

    kwargs = dict(ndims=1, initial_condition=.5, seed=0,
                  activation="Tanh", layout="fafaf", features=[12, 10, 1])
    s1 = Solver(_ode, **kwargs)
    s1.fit(niters=100, batch_size=256, lr=0.02, progress=False)
    s2 = Solver(_ode, mesh=mesh, **kwargs)
    s2.fit(niters=100, batch_size=256, lr=0.02, progress=False)
    np.testing.assert_allclose(s1.losses, s2.losses, rtol=1e-4, atol=1e-6)
    run_chunk, args = _compiled_chunk(s2)
    assert "all-reduce" in run_chunk.lower(*args).compile().as_text()


def test_two_axis_mesh_divisibility_counts_the_product():
    mesh = make_mesh(shape=(2, 4), axis_names=("dcn", "data"))
    solver = Solver(_ode, ndims=1, mesh=mesh, seed=0)
    with pytest.raises(ValueError, match="total size 8"):
        solver.fit(niters=1, batch_size=12, progress=False)


def test_three_axis_mesh_with_models_composes():
    # ('models', 'dcn', 'data') 2x2x2: ensemble sharded 2-way, batch
    # sharded over the remaining 4-device product.
    mesh = make_mesh(shape=(2, 2, 2), axis_names=("models", "dcn", "data"))
    solver = Solver(_ode, ndims=1, initial_condition=.5, mesh=mesh, seed=0,
                    n_models=2, activation="Tanh", layout="fafaf",
                    features=[12, 10, 1])
    solver.fit(niters=50, batch_size=64, lr=0.02, progress=False)
    assert np.isfinite(solver.losses).all()
    assert solver.predict_all(np.linspace(0, 1, 9)).shape == (2, 9, 1)


def _compiled_chunk(solver):
    """Fetch the (already-fitted) solver's cached jitted chunk runner and a
    concrete argument tuple for lowering/inspection."""
    (run_chunk, prep), = solver._step_cache.values()
    theta, opt_state = prep(solver.model.params)
    args = ((theta, opt_state), jax.random.key(0), np.int32(0), np.int32(0),
            np.int32(1), np.float32(0.0), np.float32(0.0),
            np.float32(-np.inf))
    return run_chunk, args


def test_mesh_step_contains_all_reduce():
    # SURVEY §2 'Parallelism' prescribes DP with an XLA-inserted gradient
    # psum — prove the psum exists: the compiled HLO of the mesh training
    # step must contain cross-device all-reduce ops, and the single-device
    # step must not (negative control).
    solver = Solver(_ode, ndims=1, initial_condition=.5, mesh=make_mesh(),
                    seed=0)
    solver.fit(niters=1, batch_size=64, progress=False)
    run_chunk, args = _compiled_chunk(solver)
    hlo = run_chunk.lower(*args).compile().as_text()
    assert "all-reduce" in hlo

    single = Solver(_ode, ndims=1, initial_condition=.5, seed=0)
    single.fit(niters=1, batch_size=64, progress=False)
    run_chunk1, args1 = _compiled_chunk(single)
    assert "all-reduce" not in run_chunk1.lower(*args1).compile().as_text()


def test_mesh_carry_shardings():
    # 1-D data mesh: parameters replicate (spec ()); 2-D ('models','data')
    # mesh: the ensemble parameter matrix is sharded over 'models'.
    from jax.sharding import PartitionSpec as P

    s1 = Solver(_ode, ndims=1, initial_condition=.5, mesh=make_mesh(), seed=0)
    s1.fit(niters=1, batch_size=64, progress=False)
    run_chunk, args = _compiled_chunk(s1)
    (theta, _), *_ = run_chunk(*args)
    assert theta.sharding.spec == P()

    mesh2 = make_mesh(shape=(2, 4), axis_names=("models", "data"))
    s2 = Solver(_ode, ndims=1, initial_condition=.5, mesh=mesh2, seed=0,
                n_models=4)
    s2.fit(niters=1, batch_size=64, progress=False)
    run_chunk2, args2 = _compiled_chunk(s2)
    (theta2, _), *_ = run_chunk2(*args2)
    assert theta2.sharding.spec == P("models")
    assert "all-reduce" in run_chunk2.lower(*args2).compile().as_text()
