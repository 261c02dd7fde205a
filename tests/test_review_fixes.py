"""Regression tests for the second review round's findings."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import pydens_tpu as pdt
from pydens_tpu import Solver, D


def test_non_elementwise_activation_disables_plan():
    # softmax mixes features: J·1 == 0, so the Taylor shortcut would zero
    # every derivative — the plan must be disabled, not silently wrong.
    def ode(f, x):
        return D(f, x) - 1.0

    solver = Solver(ode, ndims=1, seed=0, layout="fa f", features=[8, 1],
                    activation=jax.nn.softmax)
    assert not solver._plan_ok
    solver.fit(niters=20, batch_size=32, progress=False)
    assert np.isfinite(solver.losses).all()
    # and the residual diagnostic is honest (nonzero derivative)
    r = solver.residual(np.linspace(0.1, 0.9, 9))
    assert np.isfinite(r).all()


def test_elementwise_custom_callable_keeps_plan():
    solver = Solver(lambda f, x: D(f, x), ndims=1, seed=0,
                    layout="fa f", features=[8, 1],
                    activation=lambda z: z * jnp.tanh(z))
    assert solver._plan_ok


def test_callable_per_component_ic_sticky_at_coincidental_batch():
    def system(f, x):
        return (D(f[:, 0:1], x), D(f[:, 1:2], x))

    solver = Solver(system, ndims=1, seed=0, layout="fa f", features=[8, 2],
                    initial_condition=lambda *a: jnp.array([0.25, -1.5]))
    # batch == n_out == 2: must NOT flip to per-point interpretation
    pred = solver.predict(np.zeros(2))
    np.testing.assert_allclose(pred, [[0.25, -1.5]] * 2, atol=1e-5)


def test_callable_per_point_ic_sticky():
    ic = lambda x: pdt.sin(np.pi * x)

    def system(f, x, t):
        return (D(f[:, 0:1], t), D(f[:, 1:2], t))

    solver = Solver(system, ndims=2, seed=0, layout="fa f", features=[8, 2],
                    initial_condition=ic)
    pred = solver.predict([0.25, 0.5], [0.0, 0.0])  # batch == n_out == 2
    expect = np.sin(np.pi * np.array([0.25, 0.5]))[:, None]
    np.testing.assert_allclose(pred, np.tile(expect, (1, 2)), atol=1e-5)


def test_periodic_rejected_for_custom_models():
    from pydens_tpu import Model, flax_model

    class Tiny(Model):
        def network_init(self, key):
            return {"w": jax.random.normal(key, (self.total, 1))}

        def network_apply(self, net, xs):
            return xs @ net["w"]

    with pytest.raises(ValueError, match="periodic"):
        Solver(lambda f, x: D(f, x), ndims=1, model=Tiny, periodic=True,
               seed=0)


def test_fused_kernel_embeds_periodic(monkeypatch):
    monkeypatch.setenv("PYDENS_TPU_FUSED", "always")
    def ode(f, x):
        return D(f, x)

    solver = Solver(ode, ndims=1, seed=0, periodic=True)
    out = solver.predict(np.linspace(0, 1, 17))
    assert out.shape == (17, 1)
    # fused path (or its CPU interpretation) must agree with the XLA path
    monkeypatch.setenv("PYDENS_TPU_FUSED", "never")
    solver.model._fused_broken = False
    np.testing.assert_allclose(out, solver.predict(np.linspace(0, 1, 17)),
                               rtol=1e-5, atol=1e-5)


def test_callback_early_stop_commits_progress():
    def ode(f, x):
        return D(f, x) - 1.0

    solver = Solver(ode, ndims=1, seed=0)
    w0 = np.asarray(solver.params["net"]["fc1"]["w"]).copy()
    solver.fit(niters=1000, batch_size=32, chunk_size=50, progress=False,
               callback=lambda it, losses: it >= 100)
    assert len(solver.losses) == 100  # stopped after the second chunk
    assert solver.history[-1]["niters"] == 100
    assert not np.allclose(np.asarray(solver.params["net"]["fc1"]["w"]), w0)


def test_callback_exception_preserves_progress():
    def ode(f, x):
        return D(f, x) - 1.0

    solver = Solver(ode, ndims=1, seed=0)
    w0 = np.asarray(solver.params["net"]["fc1"]["w"]).copy()

    def boom(it, losses):
        if it >= 100:
            raise RuntimeError("stop!")

    with pytest.raises(RuntimeError, match="stop!"):
        solver.fit(niters=1000, batch_size=32, chunk_size=50,
                   progress=False, callback=boom)
    # the 100 completed iterations are committed, not discarded
    assert len(solver.losses) == 100
    assert not np.allclose(np.asarray(solver.params["net"]["fc1"]["w"]), w0)
