"""Regression tests for the round-3 whole-package review findings."""

import numpy as np
import pytest

import pydens_tpu as pdt
from pydens_tpu import Solver, D, NumpySampler as NS


def _ode(f, x):
    return D(f, x) - 2 * np.pi * pdt.cos(2 * np.pi * x)


def test_dt_exported_from_top_level():
    from pydens_tpu import dt, dn  # siblings must both resolve
    assert callable(dt) and callable(dn)
    assert "dt" in pdt.__all__


def test_unknown_model_kwarg_raises():
    with pytest.raises(ValueError, match="activaton"):
        Solver(_ode, ndims=1, activaton="Tanh")  # typo'd 'activation'


def test_adaptive_rejects_non_mse_criterion():
    solver = Solver(_ode, ndims=1, seed=0)
    with pytest.raises(ValueError, match="MSE"):
        solver.fit(niters=1, batch_size=8, adaptive=4, criterion="L1Loss",
                   progress=False)


def test_malformed_constraint_term_raises_cleanly():
    solver = Solver(_ode, ndims=1, seed=0,
                    constraints=lambda f, x: f(0.0) - 0.5)
    with pytest.raises(ValueError, match="constraint_<k>"):
        solver.fit(niters=1, batch_size=8,
                   loss_terms=["equation", "constraints"], progress=False)
    # Reference quirk intact: unknown NON-constraint names silently drop.
    solver.fit(niters=2, batch_size=8,
               loss_terms=["equation", "bogus"], progress=False)


def test_expr_equality_is_elementwise():
    from pydens_tpu.ops.tokens import Expr, EvalContext

    col = np.array([[0.0], [1.0], [0.0]], np.float32)
    ctx = EvalContext([col])
    x = Expr(lambda ls: ls[0], ctx, leaf_index=0)
    eq = np.asarray(x == 0.0)
    np.testing.assert_array_equal(eq, col == 0.0)
    ne = np.asarray(x != 0.0)
    np.testing.assert_array_equal(ne, col != 0.0)
    assert hash(x) == object.__hash__(x)  # still identity-hashable


def test_ready_optax_lbfgs_instance_routes_linesearch():
    import optax

    solver = Solver(_ode, ndims=1, initial_condition=.5, seed=0,
                    activation="Tanh", layout="fafaf", features=[12, 10, 1])
    solver.fit(niters=100, batch_size=256, lr=0.02, progress=False)
    # A READY GradientTransformationExtraArgs must get value/grad/value_fn
    # like the string 'LBFGS' spelling does (it used to crash in trace).
    solver.fit(niters=20, batch_size=256, optimizer=optax.lbfgs(),
               resample=False, progress=False)
    assert np.isfinite(solver.losses).all()
    assert solver.losses[-1] < 1e-3


def test_loss_balancing_traces_with_bfloat16():
    import jax.numpy as jnp

    def ode(f, x):
        return D(f, x) - 1.0

    solver = Solver(ode, ndims=1, seed=0, dtype=jnp.bfloat16,
                    constraints=lambda f, x: f(0.5) - 0.5)
    solver.fit(niters=5, batch_size=16, loss_balancing=2,
               loss_terms=["equation", "constraint_0"], progress=False)
    assert np.isfinite(solver.losses).all()


def test_mapped_sampler_width_known_at_construction():
    s = NS("u", dim=2).apply(lambda p: p[:, :1])
    assert s.ndims == 1
    # Compositions built BEFORE the first draw now see the mapped width.
    t = s.truncate(0.2, 0.8)
    pts = t.sample(64)
    assert pts.shape == (64, 1)
    assert (pts >= 0.2).all() and (pts <= 0.8).all()


def test_plan_auto_accounts_for_adaptive_pool(monkeypatch):
    solver = Solver(_ode, ndims=1, seed=0)
    seen = {}
    orig = solver._auto_use_plan

    def spy(batch):
        seen["batch"] = batch
        return orig(batch)

    monkeypatch.setattr(solver, "_auto_use_plan", spy)
    solver.fit(niters=2, batch_size=32, adaptive=4, progress=False)
    assert seen["batch"] == 128  # candidate pool, not the nominal batch
