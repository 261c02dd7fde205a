"""Wave-equation workload (the reference's README names the wave equation as
a supported family, README.md:9) and fit-history observability."""

import numpy as np

import pydens_tpu as pdt
from pydens_tpu import Solver, D


def test_wave_equation_trains_and_binds_ic():
    # u_tt = 4 u_xx, string pinned at the ends (bc=0), plucked ic.
    def wave(f, x, t):
        return D(D(f, t), t) - 4 * D(D(f, x), x)

    ic = lambda x: x * (1 - x)
    solver = Solver(wave, ndims=2, initial_condition=ic,
                    boundary_condition=0.0, layout="fafaf",
                    features=[16, 16, 1], activation="Tanh", seed=0)
    solver.fit(niters=300, batch_size=512, lr=0.005, progress=False)
    assert solver.losses[-1] < solver.losses[0]
    # IC bound exactly at t=0.
    xs = np.linspace(0, 1, 21).reshape(-1, 1)
    pred = solver.predict(xs, 0.0).ravel()
    np.testing.assert_allclose(pred, (xs * (1 - xs)).ravel(), atol=1e-5)
    # String pinned at both ends for all t.
    ends = solver.predict(np.array([0.0, 1.0]), 0.37).ravel()
    np.testing.assert_allclose(ends, 0.0, atol=1e-5)


def test_history_records_fits():
    def ode(f, x):
        return D(f, x) - 1.0

    solver = Solver(ode, ndims=1, seed=0)
    solver.fit(niters=10, batch_size=32, progress=False)
    solver.fit(niters=5, batch_size=16, optimizer=None, lr=0.001,
               progress=False)
    assert len(solver.history) == 2
    rec = solver.history[0]
    assert rec["niters"] == 10 and rec["batch_size"] == 32
    assert rec["optimizer"] == "Adam" and rec["wall_time_s"] > 0
    assert np.isfinite(rec["final_loss"])
    assert solver.history[1]["optimizer"] == "reused"
    solver.reset()
    assert solver.history == [] and solver.losses == []
