"""Non-rectangular domains: GeometrySampler (indicator-based interior
points) + BoundarySampler (parametrized boundary) with constraint-based
boundary conditions — a superset of the reference's rectangular-only
domains."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import pydens_tpu as pdt
from pydens_tpu import (Solver, D, GeometrySampler, BoundarySampler,
                        laplace)


def unit_disk():
    return GeometrySampler(lambda p: (p ** 2).sum(axis=-1) <= 1.0,
                           bbox=[(-1, 1), (-1, 1)], seed=0)


def test_geometry_sampler_host_and_device():
    disk = unit_disk()
    pts = disk.sample(500)
    assert pts.shape == (500, 2)
    assert ((pts ** 2).sum(axis=1) <= 1.0 + 1e-9).all()
    dev = np.asarray(disk.sample_device(jax.random.key(0), 500))
    assert dev.shape == (500, 2)
    assert ((dev ** 2).sum(axis=1) <= 1.0 + 1e-6).all()
    # points actually spread over the disk, not degenerate repeats
    assert np.unique(np.round(dev, 3), axis=0).shape[0] > 400


def test_geometry_sampler_thin_region_repeats_not_crashes():
    thin = GeometrySampler(lambda p: jnp.abs(p[:, 0]) < 0.01,
                           bbox=[(-1, 1)], oversample=2, seed=0)
    dev = np.asarray(thin.sample_device(jax.random.key(0), 64))
    assert (np.abs(dev[:, 0]) < 0.01).all()  # valid points (repeated is ok)


def test_boundary_sampler_circle():
    circle = BoundarySampler(
        lambda u: jnp.concatenate([jnp.cos(2 * jnp.pi * u),
                                   jnp.sin(2 * jnp.pi * u)], axis=1),
        ndims=2, seed=0)
    pts = circle.sample(200)
    np.testing.assert_allclose((pts ** 2).sum(axis=1), 1.0, atol=1e-6)
    dev = np.asarray(circle.sample_device(jax.random.key(0), 200))
    np.testing.assert_allclose((dev ** 2).sum(axis=1), 1.0, atol=1e-5)


def test_poisson_on_disk_with_boundary_constraint():
    # Laplace(u) = -4 on the unit disk, u = 0 on the circle
    # =>  u = 1 - x^2 - y^2.
    def pde(f, x, y):
        return laplace(f, x, y) + 4.0

    circle_pts = BoundarySampler(
        lambda u: jnp.concatenate([jnp.cos(2 * jnp.pi * u),
                                   jnp.sin(2 * jnp.pi * u)], axis=1),
        ndims=2, seed=1).sample(256).astype(np.float32)

    solver = Solver(pde, ndims=2, seed=0, domain=[(-1, 1), (-1, 1)],
                    layout="fa fa f", features=[24, 24, 1],
                    activation="Tanh",
                    constraints=lambda f, x, y: f(circle_pts[:, 0:1],
                                                  circle_pts[:, 1:2]))
    solver.fit(niters=1500, batch_size=512, sampler=unit_disk(), lr=0.01,
               loss_terms={"equation": 1.0, "constraint_0": 20.0},
               progress=False)
    pts = unit_disk().sample(300).astype(np.float32)
    pred = solver.predict(pts).ravel()
    true = 1 - (pts ** 2).sum(axis=1)
    assert np.max(np.abs(pred - true)) < 0.1
