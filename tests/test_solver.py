"""End-to-end Solver tests: the 5 reference workloads (tutorial cells 12-63)
with numeric convergence assertions the reference's notebook-exec smoke test
lacked (SURVEY §4), plus API behavior tests."""

import numpy as np
import pytest

import pydens_tpu as pdt
from pydens_tpu import Solver, D, V, NumpySampler as NS


def test_ode_with_initial_condition_converges():
    # Tutorial cells 12-16: f' = 2*pi*cos(2*pi*x), f(0) = 0.5
    def ode(f, x):
        return D(f, x) - 2 * np.pi * pdt.cos(2 * np.pi * x)

    solver = Solver(ode, ndims=1, initial_condition=.5, activation="Tanh",
                    layout="fafaf", features=[12, 10, 1], seed=0)
    solver.fit(niters=500, batch_size=400, lr=0.02, progress=False)
    assert solver.losses[-1] < 5e-3
    xs = np.linspace(0, 1, 100)
    err = np.max(np.abs(solver.predict(xs).ravel()
                        - (np.sin(2 * np.pi * xs) + .5)))
    assert err < 0.05
    assert len(solver.losses) == 500


def test_poisson_2d_converges():
    # Tutorial cells 19-25 (smaller net): residual loss must drop.
    def pde(f, x, y):
        return (D(D(f, x), x) + D(D(f, y), y)
                - 5 * pdt.sin(np.pi * (x + y)))

    solver = Solver(pde, ndims=2, boundary_condition=1, layout="fafaf",
                    features=[10, 10, 1], activation="Tanh", seed=0)
    solver.fit(niters=300, batch_size=400, lr=0.02, progress=False)
    assert solver.losses[-1] < 0.05
    # boundary exactly bound
    edge = solver.predict(np.zeros(5), np.linspace(0, 1, 5))
    np.testing.assert_allclose(edge, 1.0, atol=1e-5)


def test_parametric_ode_family_converges():
    # Tutorial cells 28-34 (reduced iters): f' = e*pi*cos(e*pi*x), f(0)=2.
    def odeparam(f, x, e):
        return D(f, x) - e * np.pi * pdt.cos(e * np.pi * x)

    solver = Solver(odeparam, ndims=1, initial_condition=2.0, nparams=1,
                    seed=0)
    sampler = NS("u", seed=0) & NS("u", low=.5, high=5.5, seed=1)
    solver.fit(niters=2500, batch_size=700, sampler=sampler, lr=0.01,
               progress=False)
    xs = np.linspace(0, 1, 60)
    for eps in (1.0, 2.0):
        pred = solver.predict(xs, eps).ravel()
        true = np.sin(eps * np.pi * xs) + 2
        assert np.max(np.abs(pred - true)) < 0.3, f"eps={eps}"


def test_heat_2d_plus_time_runs_and_binds_conditions():
    # Tutorial cells 37-46 (reduced): heat equation with ic & bc, nparams=1.
    def pde(f, x, y, t, a):
        return D(D(f, x), x) + D(D(f, y), y) - a * D(f, t)

    ic = lambda x, y: 10 * x * y * (1 - x) * (1 - y)
    solver = Solver(pde, ndims=3, nparams=1, initial_condition=ic,
                    boundary_condition=0, layout="fafaf",
                    features=[16, 16, 1], activation="Sigmoid", seed=0)
    solver.fit(niters=200, batch_size=512, lr=0.001, progress=False)
    assert np.isfinite(solver.losses).all()
    assert solver.losses[-1] < solver.losses[0]
    # IC bound exactly at t=0 for any parameter value
    pts = np.random.default_rng(0).uniform(size=(20, 2)).astype(np.float32)
    pred = solver.predict(pts[:, 0:1], pts[:, 1:2], 0.0, 1.7).ravel()
    true = 10 * pts[:, 0] * pts[:, 1] * (1 - pts[:, 0]) * (1 - pts[:, 1])
    np.testing.assert_allclose(pred, true, atol=1e-4)


def test_inverse_problem_v_token_two_phase():
    # Tutorial cells 50-63: trainable V in the equation; two-phase training
    # with freeze/unfreeze and an interior constraint.
    def odevar(f, x):
        return (D(f, x) - 2 * np.pi * pdt.cos(2 * np.pi * x)
                + V("new_var", data=np.array([1.0])))

    solver = Solver(odevar, ndims=1, initial_condition=1,
                    constraints=lambda f, x: f(np.array([0.5])), seed=0)
    assert "new_var" in solver.params["variables"]

    # Phase 1: freeze the variable, solve the equation with new_var = 1.
    solver.model.freeze_trainable(variables=("new_var",))
    solver.fit(niters=400, batch_size=500, lr=0.1, progress=False)
    np.testing.assert_allclose(
        np.asarray(solver.params["variables"]["new_var"]), [1.0])
    xs = np.linspace(0, 1, 100)
    # f' = 2*pi*cos(2*pi*x) - new_var, f(0)=1, new_var=1  =>  sin + 1 - x
    true1 = np.sin(2 * np.pi * xs) + 1 - xs
    err1 = np.max(np.abs(solver.predict(xs).ravel() - true1))
    assert err1 < 0.15

    # Phase 2: unfreeze; constraint f(0.5)=0 forces new_var -> 2 and the
    # solution toward sin(2*pi*x) + 1 - 2x (tutorial cell 57's closed form).
    solver.model.unfreeze_trainable(variables=["new_var"])
    solver.fit(niters=300, batch_size=100, lr=0.1,
               loss_terms=["equation", "constraint_0"], progress=False)
    new_var = float(np.asarray(solver.params["variables"]["new_var"]).ravel()[0])
    assert abs(new_var - 2.0) < 0.35
    assert abs(float(solver.predict(0.5)[0, 0])) < 0.1


def test_v_token_in_initial_condition():
    # README.md:111-119: V inside the initial condition callable.
    def odevar(u, t):
        return D(u, t) - 2 * np.pi * pdt.cos(2 * np.pi * t)

    def initial(*args):
        return V("init", data=np.array([3.0]))

    solver = Solver(odevar, ndims=1, initial_condition=initial,
                    constraints=lambda u, t: u(np.array([0.5])), seed=0)
    assert "init" in solver.params["variables"]
    # Training against the constraint adjusts the initial value toward 0
    # at x=0.5  =>  init -> 0 (since sin term vanishes at 0.5... shifts).
    solver.fit(niters=300, batch_size=300, lr=0.05,
               loss_terms=["equation", "constraint_0"], progress=False)
    init_val = float(np.asarray(solver.params["variables"]["init"]).ravel()[0])
    assert abs(init_val - 3.0) > 0.05  # actually moved


def test_optimizer_none_reuses_state():
    def ode(f, x):
        return D(f, x) - 1.0

    solver = Solver(ode, ndims=1, initial_condition=0.0, seed=0)
    solver.fit(niters=50, batch_size=64, progress=False)
    with pytest.raises(ValueError, match="previous fit"):
        Solver(ode, ndims=1, initial_condition=0.0).fit(
            niters=1, batch_size=8, optimizer=None, progress=False)
    # reuse: loss keeps improving without resetting Adam moments
    l1 = solver.losses[-1]
    solver.fit(niters=200, batch_size=64, optimizer=None, progress=False)
    assert solver.losses[-1] < l1 * 1.5
    assert len(solver.losses) == 250


def test_losses_alias_for_loss_terms():
    def ode(f, x):
        return D(f, x)

    solver = Solver(ode, ndims=1, constraints=lambda f, x: f(0.25) - 1.0,
                    seed=0)
    solver.fit(niters=5, batch_size=16,
               losses=["equation", "constraint_0"], progress=False)
    assert len(solver.losses) == 5


def test_constraint_index_out_of_range():
    def ode(f, x):
        return D(f, x)

    solver = Solver(ode, ndims=1, seed=0)
    with pytest.raises(ValueError, match="constraint_0"):
        solver.fit(niters=1, batch_size=8, loss_terms=["constraint_0"],
                   progress=False)


def test_predict_mixed_inputs_and_shapes():
    def ode(f, x, e):
        return D(f, x) - e

    solver = Solver(ode, ndims=1, nparams=1, seed=0)
    out = solver.predict(np.linspace(0, 1, 7), 4.0)
    assert out.shape == (7, 1)
    with pytest.raises(ValueError, match="coordinate columns"):
        solver.predict(np.linspace(0, 1, 7))


def test_model_call_like_reference():
    def ode(f, x):
        return D(f, x)

    solver = Solver(ode, ndims=1, seed=0)
    out = solver.model(np.linspace(0, 1, 9))
    assert out.shape == (9, 1)


def test_freeze_layers_stops_updates():
    def ode(f, x):
        return D(f, x) - 1.0

    solver = Solver(ode, ndims=1, seed=0)
    w_before = np.asarray(solver.params["net"]["fc1"]["w"]).copy()
    solver.model.freeze_trainable(layers=["fc1"], variables=["log_scale"])
    solver.fit(niters=30, batch_size=64, progress=False)
    np.testing.assert_allclose(
        np.asarray(solver.params["net"]["fc1"]["w"]), w_before)
    np.testing.assert_allclose(np.asarray(solver.params["log_scale"]), 0.0)
    # other layers did move
    assert not np.allclose(
        np.asarray(solver.params["net"]["fc2"]["w"]),
        np.asarray(solver.params["net"]["fc2"]["w"]) * 0 + w_before.mean())
    # freeze_layers alias exists (README.md:126 spelling)
    solver.model.unfreeze_layers(layers=["fc1"])
    solver.fit(niters=5, batch_size=64, progress=False)
    assert not np.allclose(
        np.asarray(solver.params["net"]["fc1"]["w"]), w_before)


def test_host_only_sampler_path():
    from pydens_tpu.samplers import ScipySampler

    def ode(f, x):
        return D(f, x) - 1.0

    solver = Solver(ode, ndims=1, seed=0)
    sampler = ScipySampler("uniform", seed=0)
    solver.fit(niters=30, batch_size=32, sampler=sampler, progress=False)
    assert len(solver.losses) == 30
    assert np.isfinite(solver.losses).all()


def test_custom_criterion_and_torch_criterion():
    def ode(f, x):
        return D(f, x) - 1.0

    solver = Solver(ode, ndims=1, seed=0)
    solver.fit(niters=5, batch_size=16, criterion="L1Loss", progress=False)
    torch = pytest.importorskip("torch")
    solver.fit(niters=5, batch_size=16, criterion=torch.nn.MSELoss(),
               progress=False)
    assert len(solver.losses) == 10
