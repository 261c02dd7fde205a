"""Random Fourier-feature embedding (spectral-bias mitigation).

No reference counterpart (pydens trains raw-coordinate MLPs only) —
this is the standard Tancik-style fix for PINNs on high-frequency
solutions: append sin/cos of a fixed Gaussian random projection of the
inputs so the NTK gains high-frequency support.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import pydens_tpu as pdt
from pydens_tpu import Solver, D
from pydens_tpu.models import ConvBlockModel


def test_spellings_and_determinism():
    # int, (m, sigma) and dict spellings all parse; B is seeded so two
    # identically-configured models embed identically (checkpoint safety).
    m1 = ConvBlockModel(ndims=1, fourier_features=8)
    m2 = ConvBlockModel(ndims=1, fourier_features=(8, 10.0))
    m3 = ConvBlockModel(ndims=1,
                        fourier_features=dict(m=8, sigma=10.0, dims=(0,)))
    np.testing.assert_array_equal(m1._rff_b, m2._rff_b)
    np.testing.assert_array_equal(m1._rff_b, m3._rff_b)
    assert m1._rff_b.shape == (8, 1)
    assert m1._rff_dims == (0,)
    # embedding width: raw column + 2m features
    xs = jnp.zeros((4, 1))
    assert m1._embed(xs).shape == (4, 1 + 16)


def test_validation():
    with pytest.raises(ValueError, match="out of range"):
        ConvBlockModel(ndims=1, fourier_features=dict(m=4, dims=(3,)))
    with pytest.raises(ValueError, match="periodic"):
        ConvBlockModel(ndims=2, periodic=(0,), initial_condition=0.0,
                       fourier_features=dict(m=4, dims=(0,)))
    with pytest.raises(ValueError, match="m >= 1"):
        ConvBlockModel(ndims=1, fourier_features=0)


def test_default_dims_skip_periodic():
    # periodic x already has an exact Fourier embedding; default RFF dims
    # must cover only the remaining columns (t here).
    m = ConvBlockModel(ndims=2, periodic=(0,), initial_condition=0.0,
                       fourier_features=4)
    assert m._rff_dims == (1,)


def test_plan_matches_fallback_with_rff():
    # The Taylor fast path must stay differential-equal to the nested-jvp
    # fallback through the RFF embedding (same contract as the periodic
    # embedding, tests/test_periodic.py).
    def pde(f, x, t):
        return D(f, t) - 0.1 * D(D(f, x), x)

    solver = Solver(pde, ndims=2, seed=0, fourier_features=(4, 2.0),
                    initial_condition=lambda x: pdt.sin(2 * np.pi * x),
                    layout="fafaf", features=[12, 12, 1])
    assert solver._plan_ok
    lt = (("equation", 1.0),)
    crit = lambda a, b: jnp.mean((a - b) ** 2)
    loss_plan, *_ = solver._build_loss_fn(lt, crit, use_plan=True)
    loss_ref, *_ = solver._build_loss_fn(lt, crit, use_plan=False)
    pts = jax.random.uniform(jax.random.key(1), (64, 2))
    leaves = [pts[:, i:i + 1] for i in range(2)]
    l1, g1 = jax.value_and_grad(loss_plan)(solver.model.params, leaves)
    l2, g2 = jax.value_and_grad(loss_ref)(solver.model.params, leaves)
    np.testing.assert_allclose(float(l1), float(l2), rtol=2e-5)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=2e-5)


def test_high_frequency_ode_converges():
    # u' = 2*pi*k*cos(2*pi*k*x), u(0)=0 => u = sin(2*pi*k*x) with k=6:
    # steep spectral content where a raw-coordinate tanh MLP of this size
    # stalls (spectral bias); the RFF model reaches low error in a small
    # budget.
    k = 6.0

    def ode(f, x):
        return D(f, x) - 2 * np.pi * k * pdt.cos(2 * np.pi * k * x)

    solver = Solver(ode, ndims=1, seed=0, fourier_features=(16, 6.0),
                    layout="fa fa f", features=[32, 32, 1],
                    activation="Tanh",
                    constraints=lambda f, x: f(np.array([0.0])))
    solver.fit(niters=1500, batch_size=512, lr=2e-3,
               loss_terms={"equation": 1.0, "constraint_0": 50.0},
               progress=False)
    xs = np.linspace(0, 1, 400)
    err = np.max(np.abs(solver.predict(xs).ravel()
                        - np.sin(2 * np.pi * k * xs)))
    assert err < 0.25, err
    assert solver.losses[-1] < solver.losses[0] / 10
