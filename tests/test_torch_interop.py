"""Torch-verbatim equation interop.

The reference's README equations are written with ``torch.*`` math on the
coordinate symbols (`/root/reference/README.md:36,83,118`).  ``Expr``
implements ``__torch_function__``, so those equations port with NO edits at
all: the torch function dispatches on the symbolic argument and is swapped
for its jax.numpy twin through the same ``lift`` routing as the numpy-ufunc
path; ``torch.Tensor`` arguments (constants in equation context) convert to
arrays.  These tests run the README flows verbatim.
"""

import numpy as np
import pytest

import pydens_tpu as pdt
from pydens_tpu import Solver, D, V
from pydens_tpu.ops.tokens import Expr

torch = pytest.importorskip("torch")


def test_readme_poisson_torch_verbatim():
    # README.md:34-42, including the torch.sin source term.
    def pde(f, x, y):
        return (D(D(f, x), x) + D(D(f, y), y)
                - 5 * torch.sin(np.pi * (x + y)))

    solver = Solver(equation=pde, ndims=2, boundary_condition=1,
                    layout='fa fa fa f', activation='Tanh',
                    units=[10, 12, 15, 1])
    solver.fit(batch_size=100, niters=600, progress=False)
    assert solver.losses[-1] < 0.05
    # boundary is bound exactly by the ansatz
    edge = solver.predict(np.zeros(5), np.linspace(0, 1, 5)).ravel()
    np.testing.assert_allclose(edge, 1.0, atol=1e-5)


def test_readme_inverse_torch_verbatim():
    # README.md:115-131: V(data=torch.Tensor) in the IC, a torch.tensor
    # probe point in the constraint, freeze_layers between fits.
    def odevar(u, t):
        return D(u, t) - 2 * np.pi * torch.cos(2 * np.pi * t)

    def initial(*args):
        return V('init', data=torch.Tensor([3.0]))

    solver = Solver(odevar, ndims=1, initial_condition=initial,
                    constraints=lambda u, t: u(torch.tensor([0.5])))
    solver.fit(batch_size=150, niters=60, lr=0.05, progress=False)
    solver.model.freeze_layers(['fc1', 'fc2', 'fc3'], ['log_scale'])
    # (Same quirk as the reference: the constraint only enters the loss
    # when loss_terms asks for it.)
    solver.fit(batch_size=150, niters=120, lr=0.05, progress=False,
               loss_terms=['equation', 'constraint_0'])
    v = float(np.asarray(solver.params['variables']['init'])[0])
    assert v < 2.0  # driven from 3.0 toward the u(0.5)=0 consistent value


def test_torch_name_mapping_and_tensor_constants():
    from pydens_tpu.ops.tokens import EvalContext, as_array

    leaves = [np.linspace(0.1, 0.9, 5, dtype=np.float32).reshape(5, 1)]
    ctx = EvalContext(leaves)
    x = Expr(lambda ls: ls[0], ctx, leaf_index=0)
    xv = leaves[0]

    # torch-spelled names map to their jnp twins (asin -> arcsin, ...).
    np.testing.assert_allclose(np.asarray(as_array(torch.asin(x))),
                               np.arcsin(xv), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(as_array(torch.sigmoid(x))),
                               1 / (1 + np.exp(-xv)), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(as_array(torch.clamp(x, 0.2, 0.5))),
        np.clip(xv, 0.2, 0.5), rtol=1e-6)
    # torch.Tensor constants mixed into the expression convert to arrays.
    scale = torch.tensor([2.0])
    np.testing.assert_allclose(np.asarray(as_array(torch.mul(x, scale))),
                               xv * 2.0, rtol=1e-6)


def test_torch_math_differentiates():
    from pydens_tpu.ops.tokens import EvalContext, as_array

    leaves = [np.linspace(0.1, 0.9, 5, dtype=np.float32).reshape(5, 1)]
    ctx = EvalContext(leaves)
    x = Expr(lambda ls: ls[0], ctx, leaf_index=0)
    xv = leaves[0]
    # d/dx sin(2x) = 2 cos(2x), through the torch spelling.
    got = as_array(D(torch.sin(2 * x), x))
    np.testing.assert_allclose(np.asarray(got), 2 * np.cos(2 * xv),
                               rtol=1e-5)


def test_unsupported_torch_function_raises_helpfully():
    def bad(u, t):
        return D(u, t) - torch.special.bessel_j0(t)

    with pytest.raises(TypeError, match="pydens_tpu"):
        Solver(bad, ndims=1, initial_condition=1)


def test_torch_max_min_elementwise():
    # torch.max/min with two array args is ELEMENTWISE (jnp.max's second
    # positional is an axis) — the obstacle-problem spelling must port.
    from pydens_tpu.ops.tokens import EvalContext, as_array

    leaves = [np.linspace(0.1, 0.9, 5, dtype=np.float32).reshape(5, 1)]
    ctx = EvalContext(leaves)
    x = Expr(lambda ls: ls[0], ctx, leaf_index=0)
    xv = leaves[0]
    np.testing.assert_allclose(
        np.asarray(as_array(torch.max(x, 0.5 - x))),
        np.maximum(xv, 0.5 - xv), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(as_array(torch.min(x, torch.tensor(0.3)))),
        np.minimum(xv, 0.3), rtol=1e-6)
