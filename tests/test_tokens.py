"""Unit tests for the D/V tokens and the Expr algebra — the reference has no
unit tests at all (SURVEY §4); derivative correctness is checked against
closed forms here."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pydens_tpu as pdt
from pydens_tpu.ops.tokens import (D, V, Expr, EvalContext, as_array,
                                   variable_scope)


def make_ctx(*cols):
    leaves = [jnp.asarray(c, jnp.float32).reshape(-1, 1) for c in cols]
    ctx = EvalContext(leaves)
    coords = [Expr((lambda i: lambda ls: ls[i])(k), ctx, leaf_index=k)
              for k in range(len(leaves))]
    return ctx, coords


def field(ctx, fn):
    return Expr(lambda ls: fn(*ls), ctx)


def test_first_derivative_of_square():
    x_vals = np.linspace(0.1, 1.0, 7)
    ctx, (x,) = make_ctx(x_vals)
    f = field(ctx, lambda x: x ** 2)
    d = D(f, x)
    np.testing.assert_allclose(np.asarray(d.value).ravel(), 2 * x_vals,
                               rtol=1e-5)


def test_second_derivative_nested():
    x_vals = np.linspace(-1, 1, 9)
    ctx, (x,) = make_ctx(x_vals)
    f = field(ctx, lambda x: x ** 3)
    d2 = D(D(f, x), x)
    np.testing.assert_allclose(np.asarray(d2.value).ravel(), 6 * x_vals,
                               rtol=1e-5)


def test_partial_derivatives_batch_diagonal():
    # f(x, y) = x * y^2: df/dx = y^2, df/dy = 2xy, per point.
    x_vals = np.array([1.0, 2.0, 3.0])
    y_vals = np.array([4.0, 5.0, 6.0])
    ctx, (x, y) = make_ctx(x_vals, y_vals)
    f = field(ctx, lambda x, y: x * y ** 2)
    np.testing.assert_allclose(np.asarray(D(f, x).value).ravel(),
                               y_vals ** 2, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(D(f, y).value).ravel(),
                               2 * x_vals * y_vals, rtol=1e-5)


def test_mixed_second_derivative():
    # d2/dxdy (x^2 y) = 2x
    x_vals = np.array([0.5, 1.5, 2.5])
    y_vals = np.array([1.0, 2.0, 3.0])
    ctx, (x, y) = make_ctx(x_vals, y_vals)
    f = field(ctx, lambda x, y: x ** 2 * y)
    np.testing.assert_allclose(np.asarray(D(D(f, x), y).value).ravel(),
                               2 * x_vals, rtol=1e-5)


def test_product_rule_through_symbolic_math():
    # D(cos(x) * f, x) must include the -sin(x) * f term.
    x_vals = np.linspace(0.1, 1.0, 5)
    ctx, (x,) = make_ctx(x_vals)
    f = field(ctx, lambda x: x ** 2)
    expr = pdt.cos(x) * f
    d = D(expr, x)
    expect = -np.sin(x_vals) * x_vals ** 2 + np.cos(x_vals) * 2 * x_vals
    np.testing.assert_allclose(np.asarray(d.value).ravel(), expect, rtol=1e-5)


def test_symbolic_math_matches_jnp_on_arrays():
    x = jnp.linspace(0, 1, 5)
    np.testing.assert_allclose(pdt.cos(x), jnp.cos(x))
    np.testing.assert_allclose(pdt.sigmoid(x), jax.nn.sigmoid(x))


def test_expr_operator_algebra():
    x_vals = np.array([2.0, 3.0])
    ctx, (x,) = make_ctx(x_vals)
    expr = (2 * x + 1) / (x - 1) - x ** 2
    expect = (2 * x_vals + 1) / (x_vals - 1) - x_vals ** 2
    np.testing.assert_allclose(np.asarray(expr.value).ravel(), expect,
                               rtol=1e-5)
    neg = -x
    np.testing.assert_allclose(np.asarray(neg.value).ravel(), -x_vals)
    np.testing.assert_allclose(np.asarray(abs(neg).value).ravel(), x_vals)


def test_D_wrt_non_leaf_raises():
    ctx, (x,) = make_ctx(np.ones(3))
    f = field(ctx, lambda x: x ** 2)
    with pytest.raises(TypeError, match="coordinate symbols"):
        D(f, f)
    with pytest.raises(TypeError, match="coordinate symbols"):
        D(f, np.ones((3, 1)))


def test_D_of_plain_array_raises_with_guidance():
    ctx, (x,) = make_ctx(np.ones(3))
    with pytest.raises(TypeError, match="lift"):
        D(jnp.ones((3, 1)), x)


def test_lift_arbitrary_function():
    x_vals = np.linspace(0.2, 1.0, 4)
    ctx, (x,) = make_ctx(x_vals)
    f = field(ctx, lambda x: x)
    custom = pdt.lift(lambda a, b: jnp.exp(a) + b)
    expr = custom(x, f)
    np.testing.assert_allclose(np.asarray(expr.value).ravel(),
                               np.exp(x_vals) + x_vals, rtol=1e-5)
    d = D(expr, x)
    np.testing.assert_allclose(np.asarray(d.value).ravel(),
                               np.exp(x_vals) + 1, rtol=1e-5)


def test_V_create_then_read():
    store = {}
    with variable_scope("create", store):
        v = V("alpha", data=np.array([3.0]))
    assert "alpha" in store
    np.testing.assert_allclose(store["alpha"], [3.0])
    with variable_scope("read", {"alpha": jnp.asarray([7.0])}):
        np.testing.assert_allclose(np.asarray(V("alpha")), [7.0])


def test_V_accepts_torch_tensor_data():
    torch = pytest.importorskip("torch")
    store = {}
    with variable_scope("create", store):
        V("beta", data=torch.tensor([2.5]))
    np.testing.assert_allclose(store["beta"], [2.5])


def test_V_outside_scope_raises():
    with pytest.raises(RuntimeError, match="outside of a Solver context"):
        V("gamma")


def test_V_unknown_in_read_mode_raises():
    with variable_scope("read", {}):
        with pytest.raises(KeyError, match="not created"):
            V("delta")


def test_V_requires_initial_value():
    with variable_scope("create", {}):
        with pytest.raises(ValueError, match="initial value"):
            V("eps")
