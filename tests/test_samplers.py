"""Tests for the sampler suite (batchflow-parity surface per SURVEY §2 plus
the device-side paths)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pydens_tpu.samplers import (NumpySampler, NS, ConstantSampler,
                                 HistoSampler, ScipySampler, ProductSampler,
                                 MixtureSampler)


def test_uniform_host_range_and_shape():
    s = NumpySampler("uniform", low=1, high=5, seed=0)
    pts = s.sample(1000)
    assert pts.shape == (1000, 1)
    assert pts.min() >= 1 and pts.max() <= 5


def test_alias_and_dim():
    s = NS("u", dim=2, seed=0)
    pts = s.sample(64)
    assert pts.shape == (64, 2)


def test_unknown_distribution():
    with pytest.raises(ValueError, match="unknown distribution"):
        NumpySampler("zzz")


def test_unknown_param():
    with pytest.raises(ValueError, match="unexpected"):
        NumpySampler("u", lam=3)


def test_product_operator():
    s = NS("u", seed=0) & NS("u", low=1, high=5, seed=1)
    pts = s.sample(500)
    assert pts.shape == (500, 2)
    assert pts[:, 0].max() <= 1 and pts[:, 1].min() >= 1
    # chained product flattens
    s3 = s & NS("u", dim=2, seed=2)
    assert s3.ndims == 4
    assert len(s3.samplers) == 3


def test_product_device_matches_dims():
    s = NS("u", dim=2) & NS("n", loc=10.0, scale=0.1)
    pts = s.sample_device(jax.random.key(0), 256)
    assert pts.shape == (256, 3)
    assert abs(float(pts[:, 2].mean()) - 10.0) < 0.1


def test_device_uniform_range():
    s = NumpySampler("uniform", low=-2, high=-1)
    pts = np.asarray(s.sample_device(jax.random.key(1), 512))
    assert pts.min() >= -2 and pts.max() <= -1


def test_normal_host_moments():
    s = NumpySampler("normal", loc=3.0, scale=0.5, seed=0)
    pts = s.sample(4000)
    assert abs(pts.mean() - 3.0) < 0.05
    assert abs(pts.std() - 0.5) < 0.05


def test_constant_sampler():
    s = ConstantSampler([1.5, -2.0])
    np.testing.assert_allclose(s.sample(3),
                               [[1.5, -2.0]] * 3)
    np.testing.assert_allclose(
        np.asarray(s.sample_device(jax.random.key(0), 2)),
        [[1.5, -2.0]] * 2)


def test_mixture_host_and_weights():
    s = 0.9 * ConstantSampler([0.0]) | 0.1 * ConstantSampler([1.0])
    pts = s.sample(2000)
    frac_ones = (pts > 0.5).mean()
    assert 0.05 < frac_ones < 0.2


def test_mixture_device():
    s = ConstantSampler([0.0]) | ConstantSampler([1.0])
    pts = np.asarray(s.sample_device(jax.random.key(0), 2000))
    frac = (pts > 0.5).mean()
    assert 0.4 < frac < 0.6


def test_mixture_dim_mismatch():
    with pytest.raises(ValueError, match="share ndims"):
        ConstantSampler([0.0]) | ConstantSampler([1.0, 2.0])


def test_histo_sampler_host_and_device():
    data = np.random.default_rng(0).normal(size=(5000, 2))
    histo = np.histogramdd(data, bins=8)
    s = HistoSampler(histo, seed=0)
    pts = s.sample(1000)
    assert pts.shape == (1000, 2)
    assert pts.min() >= data.min() - 1e-6 and pts.max() <= data.max() + 1e-6
    dev = np.asarray(s.sample_device(jax.random.key(0), 1000))
    assert dev.shape == (1000, 2)
    assert abs(dev.mean() - pts.mean()) < 0.3


def test_scipy_sampler():
    s = ScipySampler("norm", loc=2.0, scale=1.0, seed=0)
    pts = s.sample(2000)
    assert pts.shape == (2000, 1)
    assert abs(pts.mean() - 2.0) < 0.1
    assert not s.supports_device


def test_apply_transform():
    s = NumpySampler("u", seed=0).apply(lambda p: p * 10)
    pts = s.sample(100)
    assert pts.max() > 5


def test_truncate_rejection():
    s = NumpySampler("n", seed=0).truncate(low=0.0)
    pts = s.sample(500)
    assert pts.min() >= 0.0


def test_supports_device_flags():
    assert NumpySampler("u").supports_device
    assert (NS("u") & NS("n")).supports_device
    assert not (NS("u") & ScipySampler("norm")).supports_device
