"""HaltonSampler: randomized quasi-Monte-Carlo collocation (superset — no
reference/batchflow counterpart)."""

import numpy as np
import jax

import pydens_tpu as pdt
from pydens_tpu import Solver, D, HaltonSampler


def test_device_and_host_paths_cover_evenly():
    s = HaltonSampler(dim=2, seed=0)
    host = s.sample(512)
    dev = np.asarray(s.sample_device(jax.random.key(0), 512))
    for pts in (host, dev):
        assert pts.shape == (512, 2)
        assert pts.min() >= 0.0 and pts.max() <= 1.0
        # Low discrepancy: the largest 1-D gap of 512 stratified points is
        # FAR below the ~16/512 typical max-gap of i.i.d. uniform draws.
        for d in range(2):
            gaps = np.diff(np.sort(pts[:, d]))
            assert gaps.max() < 8.0 / 512, gaps.max()


def test_rotation_randomizes_but_preserves_coverage():
    s = HaltonSampler(dim=1, seed=0)
    a = np.asarray(s.sample_device(jax.random.key(1), 256)).ravel()
    b = np.asarray(s.sample_device(jax.random.key(2), 256)).ravel()
    assert not np.allclose(a, b)  # fresh points per draw (rotation)
    assert np.max(np.diff(np.sort(b))) < 8.0 / 256


def test_product_base_collision_raises():
    # Two dim=1 Haltons would both ride prime base 2: identical sequences
    # up to a constant rotation — every point on one wrapped diagonal.
    # The product must fail fast instead of silently degenerating.
    import pytest
    with pytest.raises(ValueError, match="base collision"):
        HaltonSampler(dim=1) & HaltonSampler(dim=1, low=0, high=0.5)


def test_domain_scaling_and_product_composition():
    # Correct composition: disjoint base_index per component (or ONE
    # sampler with dim=n and per-dim bounds).
    s = HaltonSampler(dim=1, low=-5, high=5, seed=0) & HaltonSampler(
        dim=1, low=0, high=0.5, seed=1, base_index=1)
    pts = s.sample(100)
    assert pts.shape == (100, 2)
    assert -5 <= pts[:, 0].min() and pts[:, 0].max() <= 5
    assert 0 <= pts[:, 1].min() and pts[:, 1].max() <= 0.5
    assert s.supports_device
    # The columns are genuinely 2-D (not a wrapped diagonal): normalized
    # column ranks must not be a constant shift of each other.
    u = (pts - pts.min(0)) / (pts.max(0) - pts.min(0))
    frac = (u[:, 0] - u[:, 1]) % 1.0
    assert frac.std() > 0.05

    joint = HaltonSampler(dim=2, low=[-5, 0], high=[5, 0.5], seed=0)
    pts2 = joint.sample(100)
    assert pts2[:, 1].max() <= 0.5 and pts2[:, 0].min() >= -5


def test_training_with_halton_collocation_converges():
    def ode(f, x):
        return D(f, x) - 2 * np.pi * pdt.cos(2 * np.pi * x)

    solver = Solver(ode, ndims=1, initial_condition=.5, seed=0,
                    activation="Tanh", layout="fafaf", features=[12, 10, 1])
    solver.fit(niters=700, batch_size=128, sampler=HaltonSampler(dim=1),
               progress=False)
    xs = np.linspace(0, 1, 101)
    err = np.max(np.abs(solver.predict(xs).ravel()
                        - (np.sin(2 * np.pi * xs) + .5)))
    assert err < 0.05, err
