"""Tests for sample algebra (the batchflow sampler suite supports arithmetic
composition of samplers — SURVEY §2 'stretch parity')."""

import jax
import numpy as np
import pytest

from pydens_tpu.samplers import ConstantSampler, NumpySampler


def test_shift_and_scale():
    s = NumpySampler("u", seed=0).scale(10).shift(5)
    pts = s.sample(200)
    assert pts.min() >= 5 and pts.max() <= 15


def test_sampler_plus_sampler():
    s = ConstantSampler([1.0]) + ConstantSampler([2.0])
    np.testing.assert_allclose(s.sample(3), 3.0)
    np.testing.assert_allclose(
        np.asarray(s.sample_device(jax.random.key(0), 3)), 3.0)


def test_scalar_reflected_ops():
    s = 1.0 + NumpySampler("u", seed=0)
    pts = s.sample(100)
    assert pts.min() >= 1.0 and pts.max() <= 2.0
    s2 = 1.0 - NumpySampler("u", seed=0)
    pts2 = s2.sample(100)
    assert pts2.min() >= 0.0 and pts2.max() <= 1.0


def test_times_elementwise():
    s = ConstantSampler([3.0]).times(ConstantSampler([4.0]))
    np.testing.assert_allclose(s.sample(2), 12.0)


def test_division():
    s = ConstantSampler([8.0]) / ConstantSampler([2.0])
    np.testing.assert_allclose(s.sample(2), 4.0)


def test_dim_mismatch_raises():
    with pytest.raises(ValueError, match="matching ndims"):
        ConstantSampler([1.0]) + ConstantSampler([1.0, 2.0])


def test_algebra_in_fit():
    import pydens_tpu as pdt
    from pydens_tpu import Solver, D

    # rescale the default uniform into [-1, 1] via algebra
    sampler = NumpySampler("u").scale(2.0).shift(-1.0)
    solver = Solver(lambda f, x: D(f, x) - x, ndims=1, domain=(-1, 1),
                    boundary_condition=0, seed=0)
    solver.fit(niters=20, batch_size=64, sampler=sampler, progress=False)
    assert np.isfinite(solver.losses).all()
