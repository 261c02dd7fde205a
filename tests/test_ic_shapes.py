"""Initial-condition shape handling across scalar/vector/system cases —
regression tests for the review findings on ambiguous IC interpretation."""

import numpy as np
import jax.numpy as jnp
import pytest

import pydens_tpu as pdt
from pydens_tpu import Solver, D
from pydens_tpu.models.base import _normalize_ic_shape


def test_constant_vector_ic_unambiguous_at_any_batch():
    def system(f, x):
        return (D(f[:, 0:1], x), D(f[:, 1:2], x))

    solver = Solver(system, ndims=1, seed=0, layout="fa f",
                    features=[8, 2],
                    initial_condition=np.array([0.25, -1.5]))
    # Batch sizes 1, 2 (== n_out, the ambiguous case), and 5 all bind the
    # same per-component values at t=0.
    for n in (1, 2, 5):
        pred = solver.predict(np.zeros(n))
        np.testing.assert_allclose(pred, np.tile([0.25, -1.5], (n, 1)),
                                   atol=1e-5)


def test_per_point_ic_wins_when_batch_equals_components():
    # Spatially-varying scalar IC on a 2-component net, evaluated at 2
    # points (N == n_out): per-point semantics (the reference's) must win.
    ic = lambda x: jnp.sin(jnp.pi * x)

    def system(f, x, t):
        return (D(f[:, 0:1], t), D(f[:, 1:2], t))

    solver = Solver(system, ndims=2, seed=0, layout="fa f",
                    features=[8, 2], initial_condition=ic)
    pred = solver.predict([0.25, 0.5], [0.0, 0.0])
    expect = np.sin(np.pi * np.array([0.25, 0.5]))[:, None]
    np.testing.assert_allclose(pred, np.tile(expect, (1, 2)), atol=1e-5)


def test_transposed_tuple_ic_raises_with_hint():
    def system(f, x, t):
        return (D(f[:, 0:1], t), D(f[:, 1:2], t))

    # The (n_out, N) tuple-of-columns spelling fails fast — already at
    # Solver construction (the discovery run traces the ansatz) — with a
    # hint to use jnp.stack(..., axis=-1).
    with pytest.raises(ValueError, match="stack"):
        Solver(system, ndims=2, seed=0, layout="fa f", features=[8, 2],
               initial_condition=lambda x: (jnp.sin(x), jnp.cos(x)))


def test_bad_ic_shapes_raise():
    with pytest.raises(ValueError, match="scalar or a 1-D"):
        Solver(lambda f, x: D(f, x), ndims=1, seed=0,
               initial_condition=np.ones((2, 2)))
    np.testing.assert_allclose(
        _normalize_ic_shape(jnp.ones(()), 4, 1), np.ones((1, 1)))
    with pytest.raises(ValueError, match="matches neither"):
        _normalize_ic_shape(jnp.ones((3,)), 4, 2)
    with pytest.raises(ValueError, match="rank-3"):
        _normalize_ic_shape(jnp.ones((1, 1, 1)), 4, 1)


def test_equation_generator_rejected():
    def gen_eq(f, x):
        return (D(f, x) for _ in range(1))

    with pytest.raises(TypeError, match="generator"):
        Solver(gen_eq, ndims=1, seed=0)
