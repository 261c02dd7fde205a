"""Taylor-mode derivative planning: the fast path must be numerically
equivalent to the universal nested-jvp path (loss AND parameter gradients),
and plan detection must be conservative (fall back whenever the equation's
derivative structure is outside the plan's scope)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import pydens_tpu as pdt
from pydens_tpu import Solver, D, V, laplace


def _diff_check(solver, total, tol=2e-5):
    """Planned and fallback loss+grad must match on random params/points."""
    lt = (("equation", 1.0),)
    crit = lambda a, b: jnp.mean((a - b) ** 2)
    loss_plan, *_ = solver._build_loss_fn(lt, crit, use_plan=True)
    loss_ref, *_ = solver._build_loss_fn(lt, crit, use_plan=False)
    pts = jax.random.uniform(jax.random.key(3), (64, total)) * 0.8 + 0.1
    leaves = [pts[:, i:i + 1] for i in range(total)]
    params = solver.model.params
    # jitted: one fused XLA computation instead of thousands of eager CPU
    # dispatches — measured 3x faster even counting the compile (the
    # high-order closures have Bell-number many tiny ops).
    l1, g1 = jax.jit(jax.value_and_grad(loss_plan))(params, leaves)
    l2, g2 = jax.jit(jax.value_and_grad(loss_ref))(params, leaves)
    np.testing.assert_allclose(float(l1), float(l2), rtol=tol)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=tol)


def test_poisson_plan_detected_and_exact():
    def pde(f, x, y):
        return D(D(f, x), x) + D(D(f, y), y) - 5 * pdt.sin(np.pi * (x + y))

    # smaller net than the README config — the diff-check compiles BOTH
    # paths' grads on CPU and arch size only affects compile time here
    solver = Solver(pde, ndims=2, boundary_condition=1, layout="fa fa f",
                    activation="Tanh", units=[10, 12, 1], seed=0)
    assert solver._plan_ok
    assert solver._plan_derivs == {(0,), (0, 0), (1,), (1, 1)}
    _diff_check(solver, 2)


def test_heat_with_ansatz_and_params_exact():
    def pde(f, x, y, t, a):
        return D(D(f, x), x) + D(D(f, y), y) - a * D(f, t)

    solver = Solver(pde, ndims=3, nparams=1,
                    initial_condition=lambda x, y: 10 * x * y * (1 - x) * (1 - y),
                    boundary_condition=0, layout="fafaf",
                    features=[16, 16, 1], activation="Sigmoid", seed=0)
    assert solver._plan_ok
    _diff_check(solver, 4)


def test_nonlinear_burgers_style_plannable():
    # f * D(f, x) is residual algebra on pure taps — plannable.
    def burgers(f, x, t):
        return D(f, t) + f * D(f, x) - 0.01 * D(D(f, x), x)

    solver = Solver(burgers, ndims=2, seed=0, layout="fafaf",
                    features=[12, 12, 1])
    assert solver._plan_ok
    _diff_check(solver, 2)


def test_system_with_skip_layout_exact():
    omega = 2 * np.pi

    def system(f, x):
        u, v = f[:, 0:1], f[:, 1:2]
        return (D(u, x) - v, D(v, x) + omega ** 2 * u)

    solver = Solver(system, ndims=1, seed=0, layout="faR fa+ f",
                    features=[16, 16, 2], activation="Tanh",
                    initial_condition=np.array([0.0, omega]))
    assert solver._plan_ok
    _diff_check(solver, 1)


def test_v_token_equation_plannable():
    def odevar(f, x):
        return D(f, x) + V("c", data=np.array([1.5])) * f

    solver = Solver(odevar, ndims=1, seed=0)
    assert solver._plan_ok
    _diff_check(solver, 1)


def test_mixed_derivative_planned_and_exact():
    def pde(f, x, y):
        return D(D(f, x), y) + 0.5 * D(D(f, x), x) - f

    solver = Solver(pde, ndims=2, seed=0, layout="fafaf",
                    features=[10, 10, 1], activation="Tanh")
    assert solver._plan_ok
    assert (0, 1) in solver._plan_derivs
    _diff_check(solver, 2)
    solver.fit(niters=10, batch_size=32, progress=False)
    assert np.isfinite(solver.losses).all()


def test_mixed_derivative_planned_with_periodic_embedding():
    def pde(f, x, y):
        return D(D(f, x), y) - 1.0

    solver = Solver(pde, ndims=2, seed=0, periodic=(0,), layout="fafaf",
                    features=[8, 8, 1], initial_condition=0.0)
    assert solver._plan_ok
    _diff_check(solver, 2)


def test_third_order_planned_and_exact():
    def pde(f, x):
        return D(D(D(f, x), x), x) - f

    solver = Solver(pde, ndims=1, seed=0, layout="fafaf",
                    features=[10, 10, 1], activation="Tanh")
    assert solver._plan_ok
    assert (0, 0, 0) in solver._plan_derivs
    _diff_check(solver, 1)


def test_kdv_planned_and_exact():
    # KdV: u_t + 6 u u_x + u_xxx = 0 — third order + nonlinear advection.
    def kdv(f, x, t):
        return D(f, t) + 6 * f * D(f, x) + D(D(D(f, x), x), x)

    solver = Solver(kdv, ndims=2, seed=0, layout="fafaf",
                    features=[12, 12, 1], activation="Tanh")
    assert solver._plan_ok
    assert (0, 0, 0) in solver._plan_derivs
    _diff_check(solver, 2)
    solver.fit(niters=10, batch_size=32, progress=False)
    assert np.isfinite(solver.losses).all()


def test_mixed_third_order_planned_and_exact():
    # u_xxy and u_xyt: mixed triples, with a second IC-style ansatz active.
    def pde(f, x, y, t):
        return (D(D(D(f, x), x), y) + 0.5 * D(D(D(f, x), y), t)
                - D(f, t) + f)

    solver = Solver(pde, ndims=3, seed=0, layout="fafaf",
                    features=[10, 10, 1], activation="Sigmoid",
                    initial_condition=lambda x, y: x * y,
                    boundary_condition=0)
    assert solver._plan_ok
    assert (0, 0, 1) in solver._plan_derivs
    assert (0, 1, 2) in solver._plan_derivs
    _diff_check(solver, 3, tol=5e-5)


def test_third_order_planned_with_periodic_embedding():
    def pde(f, x, t):
        return D(f, t) + D(D(D(f, x), x), x)

    solver = Solver(pde, ndims=2, seed=0, periodic=(0,), layout="fafaf",
                    features=[8, 8, 1], initial_condition=0.0)
    assert solver._plan_ok
    _diff_check(solver, 2, tol=5e-5)


def test_fourth_order_planned_and_exact():
    # Euler–Bernoulli beam operator: u_xxxx - load.
    def pde(f, x):
        return D(D(D(D(f, x), x), x), x) - f

    solver = Solver(pde, ndims=1, seed=0, layout="fafaf",
                    features=[10, 10, 1], activation="Tanh")
    assert solver._plan_ok
    assert (0, 0, 0, 0) in solver._plan_derivs
    _diff_check(solver, 1, tol=5e-5)


def test_biharmonic_mixed_quad_planned_and_exact():
    # 2D biharmonic: u_xxxx + 2 u_xxyy + u_yyyy, with a Dirichlet ansatz.
    def pde(f, x, y):
        uxx = D(D(f, x), x)
        uyy = D(D(f, y), y)
        return (D(D(uxx, x), x) + 2 * D(D(uxx, y), y) + D(D(uyy, y), y)
                - 1.0)

    solver = Solver(pde, ndims=2, seed=0, boundary_condition=0,
                    layout="fafaf", features=[10, 10, 1], activation="Tanh")
    assert solver._plan_ok
    assert (0, 0, 1, 1) in solver._plan_derivs
    assert (0, 0, 0, 0) in solver._plan_derivs
    _diff_check(solver, 2, tol=1e-4)


def test_fourth_order_planned_with_periodic_embedding():
    def pde(f, x, t):
        return D(f, t) + D(D(D(D(f, x), x), x), x)

    solver = Solver(pde, ndims=2, seed=0, periodic=(0,), layout="fafaf",
                    features=[8, 8, 1], initial_condition=0.0)
    assert solver._plan_ok
    _diff_check(solver, 2, tol=1e-4)


def test_sixth_order_planned_and_exact():
    # The generic partition rule covers any order <= PLAN_MAX_ORDER: u_xxxxxx
    # (e.g. the tri-harmonic/phase-field-crystal operator class).
    def pde(f, x):
        d = f
        for _ in range(6):
            d = D(d, x)
        return d - f

    solver = Solver(pde, ndims=1, seed=0, layout="fa f", features=[8, 1],
                    activation="Tanh")
    assert solver._plan_ok
    assert (0,) * 6 in solver._plan_derivs
    _diff_check(solver, 1, tol=2e-4)


def test_seventh_order_falls_back():
    def pde(f, x):
        d = f
        for _ in range(7):
            d = D(d, x)
        return d

    solver = Solver(pde, ndims=1, seed=0)
    assert not solver._plan_ok
    solver.fit(niters=5, batch_size=16, progress=False)


def test_product_rule_coefficient_falls_back():
    # D applied to a composite expression (cos(x) * f) voids the plan.
    def pde(f, x):
        return D(pdt.cos(x) * f, x) - 1.0

    solver = Solver(pde, ndims=1, seed=0)
    assert not solver._plan_ok
    solver.fit(niters=5, batch_size=16, progress=False)


def test_custom_model_falls_back():
    from pydens_tpu import Model

    class Tiny(Model):
        def network_init(self, key):
            return {"w": jax.random.normal(key, (self.total, 1)) * 0.3}

        def network_apply(self, net, xs):
            return jnp.tanh(xs @ net["w"])

    solver = Solver(lambda f, x: D(f, x) - 1.0, ndims=1, model=Tiny, seed=0)
    assert not solver._plan_ok  # no taylor propagation for custom bodies
    solver.fit(niters=5, batch_size=16, progress=False)


def test_constraints_do_not_void_equation_plan():
    def ode(f, x):
        return D(f, x) - 1.0

    # constraint uses D too — evaluated via the universal closures, but the
    # equation's plan must survive.
    solver = Solver(ode, ndims=1, seed=0,
                    constraints=lambda f, x: D(f(x), x) - 1.0)
    assert solver._plan_ok
    solver.fit(niters=10, batch_size=32,
               loss_terms=["equation", "constraint_0"], progress=False)
    assert np.isfinite(solver.losses).all()


def test_planned_training_converges_same_as_fallback():
    def ode(f, x):
        return D(f, x) - 2 * np.pi * pdt.cos(2 * np.pi * x)

    def run(fast):
        s = Solver(ode, ndims=1, initial_condition=.5, activation="Tanh",
                   layout="fafaf", features=[12, 10, 1], seed=0)
        s.fit(niters=300, batch_size=256, lr=0.02, fast_taps=fast,
              progress=False)
        return np.asarray(s.losses)

    l_plan = run("auto")
    l_ref = run(False)
    # identical RNG stream + exact math => near-identical loss trajectories
    np.testing.assert_allclose(l_plan, l_ref, rtol=2e-2, atol=1e-4)


def test_adaptive_sampling_with_plan():
    def stiff(f, x):
        return D(f, x) - 10 * pdt.exp(-50 * (x - 0.5) ** 2)

    solver = Solver(stiff, ndims=1, seed=0)
    assert solver._plan_ok
    solver.fit(niters=30, batch_size=64, adaptive=4, progress=False)
    assert np.isfinite(solver.losses).all()
