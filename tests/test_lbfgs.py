"""L-BFGS finishing phase + resample=False (full-batch) tests — a superset
of the reference, whose optimizer registry is torch.optim by name
(``model_torch.py:419-422``; torch's LBFGS requires a closure the reference
never wires up, so the reference cannot actually run LBFGS)."""

import numpy as np
import pytest

import pydens_tpu as pdt
from pydens_tpu import Solver, D


def _ode(f, x):
    return D(f, x) - 2 * np.pi * pdt.cos(2 * np.pi * x)


def test_lbfgs_finishing_phase_improves_loss():
    solver = Solver(_ode, ndims=1, initial_condition=.5, activation="Tanh",
                    layout="fafaf", features=[12, 10, 1], seed=0)
    solver.fit(niters=300, batch_size=512, lr=0.02, progress=False)
    adam_loss = solver.losses[-1]
    # Full-batch L-BFGS polish on a fixed batch.
    solver.fit(niters=100, batch_size=512, optimizer="LBFGS",
               resample=False, progress=False)
    lbfgs_loss = solver.losses[-1]
    assert lbfgs_loss < adam_loss
    assert lbfgs_loss < 1e-4  # L-BFGS should get much deeper than Adam
    xs = np.linspace(0, 1, 100)
    err = np.max(np.abs(solver.predict(xs).ravel()
                        - (np.sin(2 * np.pi * xs) + .5)))
    assert err < 0.02


def test_resample_false_uses_fixed_batch():
    # With a fixed batch and SGD lr=0, loss must be constant across iters.
    solver = Solver(_ode, ndims=1, seed=0)
    solver.fit(niters=8, batch_size=64, optimizer="SGD", lr=0.0,
               resample=False, progress=False)
    assert np.ptp(np.asarray(solver.losses)) < 1e-12


def test_resample_true_varies_batch():
    solver = Solver(_ode, ndims=1, seed=0)
    solver.fit(niters=8, batch_size=64, optimizer="SGD", lr=0.0,
               resample=True, progress=False)
    assert np.ptp(np.asarray(solver.losses)) > 0


def test_resample_false_with_host_sampler():
    from pydens_tpu.samplers import ScipySampler
    solver = Solver(_ode, ndims=1, seed=0)
    solver.fit(niters=8, batch_size=64, optimizer="SGD", lr=0.0,
               sampler=ScipySampler("uniform", seed=0),
               resample=False, progress=False)
    assert np.ptp(np.asarray(solver.losses)) < 1e-12


def test_lbfgs_memory_size_kwarg():
    solver = Solver(_ode, ndims=1, seed=0)
    solver.fit(niters=5, batch_size=64, optimizer="LBFGS", resample=False,
               memory_size=5, progress=False)
    assert len(solver.losses) == 5
