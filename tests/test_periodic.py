"""Periodic boundary conditions via Fourier input embedding: the solution
and ALL its derivatives are exactly periodic by construction (no reference
counterpart)."""

import warnings

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import pydens_tpu as pdt
from pydens_tpu import Solver, D


def test_periodicity_exact_by_construction():
    def ode(f, x):
        return D(D(f, x), x) + (2 * np.pi) ** 2 * pdt.sin(2 * np.pi * x)

    solver = Solver(ode, ndims=1, seed=0, periodic=True,
                    layout="fa fa f", features=[24, 24, 1],
                    activation="Tanh",
                    constraints=lambda f, x: f(np.array([0.25])) - 1.0)
    # exact periodicity holds at ANY parameters (untrained included)
    np.testing.assert_allclose(solver.predict(0.0), solver.predict(1.0),
                               rtol=1e-6)
    np.testing.assert_allclose(solver.predict_grad(np.zeros(1)),
                               solver.predict_grad(np.ones(1)), rtol=1e-5)


def test_periodic_poisson_converges():
    # u'' = -(2*pi)^2 sin(2*pi*x) on the unit circle; f(0.25)=1 pins the
    # free constant => u = sin(2*pi*x).
    def ode(f, x):
        return D(D(f, x), x) + (2 * np.pi) ** 2 * pdt.sin(2 * np.pi * x)

    solver = Solver(ode, ndims=1, seed=0, periodic=True,
                    layout="fa fa f", features=[24, 24, 1],
                    activation="Tanh",
                    constraints=lambda f, x: f(np.array([0.25])) - 1.0)
    assert solver._plan_ok  # taylor plan supports the embedding
    solver.fit(niters=2000, batch_size=512, lr=0.01,
               loss_terms={"equation": 1.0, "constraint_0": 20.0},
               progress=False)
    xs = np.linspace(0, 1, 100)
    err = np.max(np.abs(solver.predict(xs).ravel() - np.sin(2 * np.pi * xs)))
    assert err < 0.1


def test_periodic_plan_matches_fallback():
    def ode(f, x, t):
        return D(f, t) - 0.1 * D(D(f, x), x)

    solver = Solver(ode, ndims=2, seed=0, periodic=(0,),
                    initial_condition=lambda x: pdt.sin(2 * np.pi * x),
                    layout="fafaf", features=[12, 12, 1])
    lt = (("equation", 1.0),)
    crit = lambda a, b: jnp.mean((a - b) ** 2)
    loss_plan, *_ = solver._build_loss_fn(lt, crit, use_plan=True)
    loss_ref, *_ = solver._build_loss_fn(lt, crit, use_plan=False)
    pts = jax.random.uniform(jax.random.key(1), (64, 2))
    leaves = [pts[:, i:i + 1] for i in range(2)]
    l1, g1 = jax.value_and_grad(loss_plan)(solver.model.params, leaves)
    l2, g2 = jax.value_and_grad(loss_ref)(solver.model.params, leaves)
    np.testing.assert_allclose(float(l1), float(l2), rtol=2e-5)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=2e-5)


def test_periodic_mixed_with_dirichlet_time():
    # periodic in x, initial condition in t — heat on a ring.
    def heat(f, x, t):
        return D(f, t) - 0.05 * D(D(f, x), x)

    solver = Solver(heat, ndims=2, seed=0, periodic=(0,),
                    initial_condition=lambda x: pdt.sin(2 * np.pi * x),
                    layout="fafaf", features=[16, 16, 1], activation="Tanh")
    solver.fit(niters=300, batch_size=512, lr=0.005, progress=False)
    # IC exact; periodicity exact at any t
    xs = np.linspace(0, 1, 11)
    np.testing.assert_allclose(solver.predict(xs, 0.0).ravel(),
                               np.sin(2 * np.pi * xs), atol=1e-5)
    np.testing.assert_allclose(solver.predict(0.0, 0.37),
                               solver.predict(1.0, 0.37), rtol=1e-5,
                               atol=1e-6)
    assert solver.losses[-1] < solver.losses[0]


def test_periodic_multiharmonic_exact_and_plan():
    # periodic={dim: m} requests m harmonics; periodicity stays exact and
    # the Taylor plan stays differential-equal to nested jvp.
    def ode(f, x, t):
        return D(f, t) - 0.1 * D(D(f, x), x)

    solver = Solver(ode, ndims=2, seed=0, periodic={0: 4},
                    initial_condition=lambda x: pdt.sin(2 * np.pi * x),
                    layout="fafaf", features=[12, 12, 1])
    assert solver.model.periodic_harmonics == {0: 4}
    np.testing.assert_allclose(solver.predict(0.0, 0.37),
                               solver.predict(1.0, 0.37), rtol=1e-5,
                               atol=1e-6)
    lt = (("equation", 1.0),)
    crit = lambda a, b: jnp.mean((a - b) ** 2)
    loss_plan, *_ = solver._build_loss_fn(lt, crit, use_plan=True)
    loss_ref, *_ = solver._build_loss_fn(lt, crit, use_plan=False)
    pts = jax.random.uniform(jax.random.key(1), (64, 2))
    leaves = [pts[:, i:i + 1] for i in range(2)]
    l1, g1 = jax.value_and_grad(loss_plan)(solver.model.params, leaves)
    l2, g2 = jax.value_and_grad(loss_ref)(solver.model.params, leaves)
    np.testing.assert_allclose(float(l1), float(l2), rtol=2e-5)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=2e-5)


def test_periodic_multiharmonic_learns_sharp_content():
    # u'' = -(6*pi)^2 sin(6*pi*x): the 3rd harmonic.  With m=4 the
    # embedding already spans it.
    def ode(f, x):
        return D(D(f, x), x) + (6 * np.pi) ** 2 * pdt.sin(6 * np.pi * x)

    solver = Solver(ode, ndims=1, seed=0, periodic={0: 4},
                    layout="fa fa f", features=[24, 24, 1],
                    activation="Tanh",
                    constraints=lambda f, x: f(np.array([0.25])))
    solver.fit(niters=2000, batch_size=512, lr=0.01,
               loss_terms={"equation": 1.0, "constraint_0": 20.0},
               progress=False)
    xs = np.linspace(0, 1, 200)
    truth = np.sin(6 * np.pi * xs) - np.sin(6 * np.pi * 0.25)
    err = np.max(np.abs(solver.predict(xs).ravel() - truth))
    assert err < 0.1, err


def test_periodic_ic_decay_probe():
    # The decay is OPT-IN (it measured worse at every budget tested,
    # BENCHMARKS.md "Allen-Cahn"); the probe's role is advisory.  A
    # wrap-incompatible IC (x^2*cos(pi*x) on [-1,1]: slope jump 4) keeps
    # the persistent binding but warns once; sin(2*pi*x) matches
    # value/slope/curvature across the wrap (no warning), as does a
    # soliton tail that reached ~1e-7 of its global scale.
    def mk(**kw):
        return Solver(lambda f, x, t: D(f, t) + D(f, x), ndims=2, seed=0,
                      layout="fa f", features=[8, 1], **kw)

    with warnings.catch_warnings():
        warnings.simplefilter("error")  # compatible ICs must NOT warn
        assert not mk(periodic=(0,),
                      initial_condition=lambda x: pdt.sin(2 * np.pi * x)
                      ).model._ic_decay_engaged()
        assert not mk(periodic=(0,),
                      initial_condition=1.0).model._ic_decay_engaged()
        sech2 = lambda x: 2 / (0.5 * (pdt.exp(x) + pdt.exp(-x))) ** 2
        assert not mk(periodic=(0,), domain=[(-10, 10), (0, 1)],
                      initial_condition=sech2).model._ic_decay_engaged()
    # Incompatible IC: persistent binding kept, one advisory warning.
    with pytest.warns(UserWarning, match="incompatible with the periodic"):
        s = mk(periodic={0: 10}, domain=[(-1, 1), (0, 1)],
               initial_condition=lambda x: x ** 2 * pdt.cos(np.pi * x))
    assert not s.model._ic_decay_engaged()
    # Explicit choices: True engages the decay, False silences the probe.
    assert mk(periodic=(0,), periodic_ic_decay=True,
              initial_condition=lambda x: pdt.sin(2 * np.pi * x)
              ).model._ic_decay_engaged()
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        assert not mk(periodic=(0,), periodic_ic_decay=False,
                      initial_condition=lambda x: x ** 2 * pdt.cos(np.pi * x)
                      ).model._ic_decay_engaged()


def test_periodic_ic_decay_keeps_ic_exact():
    # With the (opt-in) decay engaged, u(x, t0) must still equal the IC
    # exactly.
    s = Solver(lambda f, x, t: D(f, t) - D(D(f, x), x), ndims=2, seed=0,
               domain=[(-1, 1), (0, 1)], periodic={0: 4},
               initial_condition=lambda x: x ** 2 * pdt.cos(np.pi * x),
               periodic_ic_decay=True,
               layout="fa f", features=[12, 1])
    assert s.model._ic_decay_engaged()
    xs = np.linspace(-1, 1, 64).astype(np.float32)
    got = s.predict(xs, np.zeros_like(xs)).ravel()
    np.testing.assert_allclose(got, xs ** 2 * np.cos(np.pi * xs),
                               rtol=1e-5, atol=1e-5)


def test_periodic_validation():
    with pytest.raises(ValueError, match="spatial"):
        Solver(lambda f, x, t: D(f, t), ndims=2, periodic=(1,), seed=0,
               initial_condition=0.0)
    with pytest.raises(ValueError, match="no effect"):
        Solver(lambda f, x: D(f, x), ndims=1, periodic=True,
               boundary_condition=1.0, seed=0)
