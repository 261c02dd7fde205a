"""`pydens_tpu.numpy` — the drop-in jnp namespace for equations.

The reference's canonical UX is plain `torch.*` math on coordinate symbols
(`/root/reference/pydens/model_torch.py:205-221` docstring examples).  These
tests port those exact docstring equations with ONLY the import line changed
(`torch` -> `pydens_tpu.numpy as jnp`), plus shim semantics (pass-through on
plain arrays, symbolic on Expr, constants/dtypes untouched).
"""

import numpy as np
import pytest

import pydens_tpu as pdt
import pydens_tpu.numpy as jnp
from pydens_tpu import Solver, D
from pydens_tpu.ops.tokens import Expr


# --- the reference docstring equations, import line swapped -----------------

def test_docstring_ode_log():
    # ``lambda f, x: D(f, x) + torch.log(x)`` (model_torch.py:207)
    solver = Solver(lambda f, x: D(f, x) + jnp.log(x + 1.0), ndims=1,
                    initial_condition=0.0, seed=0)
    solver.fit(niters=30, batch_size=64, progress=False)
    assert np.isfinite(solver.losses).all()


def test_docstring_ode_cos_converges():
    # model_torch.py:210-212
    def ode(f, x):
        return D(f, x) - 2 * np.pi * jnp.cos(2 * np.pi * x)

    solver = Solver(ode, ndims=1, initial_condition=0.5, seed=0,
                    activation="Tanh", layout="fafaf", features=[12, 10, 1])
    solver.fit(niters=400, batch_size=256, lr=0.02, progress=False)
    xs = np.linspace(0, 1, 50)
    err = np.max(np.abs(solver.predict(xs).ravel()
                        - (np.sin(2 * np.pi * xs) + 0.5)))
    assert err < 0.1


def test_docstring_pde_sin():
    # model_torch.py:215-217
    def pde(f, x, y):
        return D(D(f, x), x) + D(D(f, y), y) - jnp.sin(np.pi * (x + y))

    solver = Solver(pde, ndims=2, boundary_condition=0.0, seed=0)
    solver.fit(niters=30, batch_size=64, progress=False)
    assert np.isfinite(solver.losses).all()


def test_docstring_parametric():
    # model_torch.py:221-223 (parametric family; e is a sampled parameter)
    def pde(f, x, e):
        return D(f, x) - e * np.pi * jnp.cos(e * np.pi * x)

    solver = Solver(pde, ndims=1, nparams=1, initial_condition=0.0, seed=0)
    solver.fit(niters=30, batch_size=64, progress=False)
    assert np.isfinite(solver.losses).all()


# --- shim semantics ----------------------------------------------------------

def test_plain_arrays_pass_through():
    x = np.linspace(0.1, 1.0, 7)
    np.testing.assert_allclose(np.asarray(jnp.cos(x)), np.cos(x), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(jnp.sum(x)), np.sum(x), rtol=1e-6)


def test_constants_and_dtypes_untouched():
    import jax.numpy as real_jnp
    assert jnp.pi == real_jnp.pi
    assert jnp.float32 is real_jnp.float32
    assert jnp.inf == real_jnp.inf
    assert jnp.ndarray is real_jnp.ndarray


def test_attribute_error_matches_jnp():
    with pytest.raises(AttributeError):
        jnp.definitely_not_a_function  # noqa: B018


def test_symbolic_on_expr_full_product_rule():
    # D(jnp.cos(x) * f, x) must apply the product rule — i.e. the shim's
    # result is an Expr, not a constant-folded array (identical to pdt.cos).
    import jax
    from pydens_tpu.ops.tokens import EvalContext, as_array

    leaves = [np.linspace(0.1, 0.9, 5, dtype=np.float32).reshape(5, 1)]
    ctx = EvalContext(leaves)
    x = Expr(lambda ls: ls[0], ctx, leaf_index=0)
    f = Expr(lambda ls: ls[0] ** 2, ctx, deriv=None)

    assert isinstance(jnp.cos(x), Expr)
    got = as_array(D(jnp.cos(x) * f, x))
    want = as_array(D(pdt.cos(x) * f, x))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)
    # analytic: d/dx [cos(x) x^2] = -sin(x) x^2 + 2 x cos(x)
    xv = leaves[0]
    np.testing.assert_allclose(
        np.asarray(got), -np.sin(xv) * xv ** 2 + 2 * xv * np.cos(xv),
        rtol=1e-5)


def test_dir_lists_jnp_surface():
    assert "arctanh" in dir(jnp) and "linspace" in dir(jnp)
