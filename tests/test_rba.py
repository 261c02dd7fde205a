"""Residual-based attention (`fit(rba=...)`): per-point EMA weights on a
fixed collocation batch.  Convergence on a stiff problem, weight dynamics
actually biting, composition with mesh/ensemble, and the validation matrix
(the scheme is undefined off the fixed-batch MSE Adam path)."""

import numpy as np
import pytest

import pydens_tpu as pdt
from pydens_tpu import Solver, D


def _stiff(f, x):
    # du/dx = sharp Gaussian source at x=0.8 — most collocation points see
    # ~zero residual; RBA's job is to keep attention on the layer.
    return D(f, x) - 50 * pdt.exp(-500 * (x - 0.8) ** 2)


def _solver(seed=0, **kw):
    return Solver(_stiff, ndims=1, seed=seed, initial_condition=0.0,
                  activation="Tanh", layout="fafaf", features=[24, 24, 1],
                  **kw)


def test_rba_fit_runs_and_converges():
    s = _solver()
    xs = np.linspace(0, 1, 256).astype(np.float32)
    before = float(np.mean(s.residual(xs)))
    s.fit(niters=400, batch_size=256, lr=5e-3, resample=False, rba=True,
          progress=False)
    assert np.isfinite(s.losses).all()
    after = float(np.mean(s.residual(xs)))
    assert after < 0.5 * before, (before, after)


def test_rba_changes_the_trajectory():
    # Same fixed batch, same seed: the only difference is the weights, and
    # they must bite (losses diverge from the unweighted run within the
    # first chunk).
    a = _solver()
    a.fit(niters=80, batch_size=128, resample=False, progress=False)
    b = _solver()
    b.fit(niters=80, batch_size=128, resample=False, rba=True,
          progress=False)
    assert not np.allclose(a.losses, b.losses, rtol=1e-4)


def test_rba_spellings_and_warm_second_fit():
    s = _solver()
    s.fit(niters=30, batch_size=64, resample=False, rba=0.05, progress=False)
    # Warm continuation (optimizer=None) rebuilds the per-point weights for
    # the new fixed batch; (eta, gamma) spelling.
    s.fit(niters=30, batch_size=64, resample=False, rba=(0.05, 0.9),
          optimizer=None, progress=False)
    assert np.isfinite(s.losses).all() and len(s.losses) == 60


def test_rba_composes_with_mesh_ensemble_and_balancing():
    from pydens_tpu.parallel import make_mesh
    s = Solver(lambda f, x, t: D(f, t) + D(f, x), ndims=2, seed=0,
               initial_condition=lambda x: pdt.sin(np.pi * x),
               constraints=lambda f, x, t: f(np.zeros(1), t),
               activation="Tanh", layout="fa fa f", features=[16, 16, 1],
               mesh=make_mesh(), n_models=2)
    s.fit(niters=20, batch_size=64, resample=False, rba=True,
          loss_terms=["equation", "constraint_0"], loss_balancing=5,
          progress=False)
    assert np.isfinite(s.losses).all()


def test_rba_validation_errors():
    s = _solver()
    with pytest.raises(ValueError, match="resample=False"):
        s.fit(niters=1, batch_size=8, rba=True, progress=False)
    with pytest.raises(ValueError, match="use one"):
        s.fit(niters=1, batch_size=8, resample=False, rba=True, adaptive=4,
              progress=False)
    with pytest.raises(ValueError, match="MSE"):
        s.fit(niters=1, batch_size=8, resample=False, rba=True,
              criterion="l1", progress=False)
    with pytest.raises(ValueError, match="not understood"):
        s.fit(niters=1, batch_size=8, resample=False, rba="yes",
              progress=False)
    with pytest.raises(ValueError, match="eta > 0"):
        s.fit(niters=1, batch_size=8, resample=False, rba=(0.0, 0.5),
              progress=False)
    with pytest.raises(ValueError, match="linesearch|LBFGS|Adam"):
        s.fit(niters=1, batch_size=8, resample=False, rba=True,
              optimizer="LBFGS", progress=False)
    with pytest.raises(ValueError, match="equation"):
        s2 = _solver(constraints=lambda f, x: f(np.zeros(1)))
        s2.fit(niters=1, batch_size=8, resample=False, rba=True,
               loss_terms=["constraint_0"], progress=False)
    ct = Solver(lambda f, x, t: D(f, t) + D(f, x), ndims=2, seed=0,
                initial_condition=lambda x: pdt.sin(np.pi * x))
    with pytest.raises(ValueError, match="one of the two"):
        ct.fit(niters=1, batch_size=8, resample=False, rba=True, causal=1.0,
               progress=False)
    v = Solver(lambda f, x: D(f, x) ** 2 / 2 - f,
               ndims=1, seed=0, formulation="variational",
               boundary_condition=0.0)
    with pytest.raises(ValueError, match="variational"):
        v.fit(niters=1, batch_size=8, resample=False, rba=True,
              progress=False)
