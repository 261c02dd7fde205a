"""Checkpoint/resume tests (superset of the reference, which has no
persistence — SURVEY §5)."""

import numpy as np
import pytest

import pydens_tpu as pdt
from pydens_tpu import Solver, D, V


def _ode(f, x):
    return D(f, x) - 2 * np.pi * pdt.cos(2 * np.pi * x)


def test_save_load_roundtrip(tmp_path):
    path = str(tmp_path / "ckpt.msgpack")
    s1 = Solver(_ode, ndims=1, initial_condition=.5, seed=0)
    s1.fit(niters=100, batch_size=128, progress=False)
    preds = s1.predict(np.linspace(0, 1, 10))
    s1.save(path)

    s2 = Solver(_ode, ndims=1, initial_condition=.5, seed=1)
    s2.load(path)
    np.testing.assert_allclose(s2.predict(np.linspace(0, 1, 10)), preds,
                               rtol=1e-6)
    assert len(s2.losses) == 100


def test_resume_training_continues(tmp_path):
    path = str(tmp_path / "ckpt.msgpack")
    s1 = Solver(_ode, ndims=1, initial_condition=.5, seed=0)
    s1.fit(niters=150, batch_size=128, progress=False)
    s1.save(path)

    s2 = Solver(_ode, ndims=1, initial_condition=.5, seed=2)
    s2.load(path)
    s2.fit(niters=100, batch_size=128, progress=False)
    assert len(s2.losses) == 250
    assert s2.losses[-1] < s2.losses[0]


def test_checkpoint_preserves_v_variables(tmp_path):
    path = str(tmp_path / "ckpt.msgpack")

    def odevar(f, x):
        return D(f, x) + V("c", data=np.array([1.5]))

    s1 = Solver(odevar, ndims=1, seed=0)
    s1.fit(niters=20, batch_size=32, progress=False)
    v = np.asarray(s1.params["variables"]["c"]).copy()
    s1.save(path)

    s2 = Solver(odevar, ndims=1, seed=3)
    s2.load(path)
    np.testing.assert_allclose(np.asarray(s2.params["variables"]["c"]), v)


def test_mismatched_config_rejected(tmp_path):
    path = str(tmp_path / "ckpt.msgpack")
    s1 = Solver(_ode, ndims=1, seed=0)
    s1.save(path)
    s2 = Solver(_ode, ndims=1, features=[7, 7, 1], layout="fafaf", seed=0)
    with pytest.raises(ValueError, match="does not match"):
        s2.load(path)


def test_bad_file_rejected(tmp_path):
    path = tmp_path / "junk.bin"
    path.write_bytes(b"not a checkpoint")
    s = Solver(_ode, ndims=1, seed=0)
    with pytest.raises(ValueError, match="not a pydens_tpu checkpoint"):
        s.load(str(path))


def test_auto_checkpoint_survives_midfit_crash(tmp_path):
    path = str(tmp_path / "auto.msgpack")
    s1 = Solver(_ode, ndims=1, initial_condition=.5, seed=0)

    def crash(iteration, losses):
        if iteration >= 300:
            raise RuntimeError("simulated crash")

    with pytest.raises(RuntimeError, match="simulated crash"):
        s1.fit(niters=600, batch_size=128, chunk_size=100,
               checkpoint_path=path, callback=crash, progress=False)

    # A fresh process's solver resumes from the last chunk-boundary
    # snapshot: params + opt state + losses + step counter all present.
    s2 = Solver(_ode, ndims=1, initial_condition=.5, seed=9)
    s2.load(path)
    assert len(s2.losses) == 300
    np.testing.assert_allclose(
        s2.predict(np.linspace(0, 1, 7)),
        s1.predict(np.linspace(0, 1, 7)), rtol=1e-6)
    # Same optimizer spec as the interrupted fit; the loaded Adam moments
    # graft onto the fresh optimizer state (checkpoint.py).
    s2.fit(niters=300, batch_size=128, progress=False)
    assert len(s2.losses) == 600
    assert s2.losses[-1] < 0.05 and s2.losses[-1] < s2.losses[0]


def test_auto_checkpoint_every_and_final(tmp_path):
    path = str(tmp_path / "auto.msgpack")
    s1 = Solver(_ode, ndims=1, initial_condition=.5, seed=0)
    s1.fit(niters=250, batch_size=64, chunk_size=50, checkpoint_every=100,
           checkpoint_path=path, progress=False)
    # The final snapshot is written at fit end regardless of the interval.
    s2 = Solver(_ode, ndims=1, initial_condition=.5, seed=3)
    s2.load(path)
    assert len(s2.losses) == 250
    np.testing.assert_allclose(
        s2.predict(np.linspace(0, 1, 7)),
        s1.predict(np.linspace(0, 1, 7)), rtol=1e-6)


def test_auto_checkpoint_written_on_early_callback_stop(tmp_path):
    # Early stop with checkpoint_every >> chunk: the final snapshot must
    # still land (regression: no interval mark ever fired).
    path = str(tmp_path / "early.msgpack")
    s1 = Solver(_ode, ndims=1, initial_condition=.5, seed=0)
    s1.fit(niters=10000, batch_size=64, chunk_size=100,
           checkpoint_every=5000, checkpoint_path=path,
           callback=lambda it, losses: it >= 300, progress=False)
    s2 = Solver(_ode, ndims=1, initial_condition=.5, seed=4)
    s2.load(path)
    assert len(s2.losses) == 300
    np.testing.assert_allclose(
        s2.predict(np.linspace(0, 1, 5)),
        s1.predict(np.linspace(0, 1, 5)), rtol=1e-6)


def test_auto_checkpoint_preserves_balancing_weights(tmp_path):
    # Mid-fit snapshots carry the learned loss-balancing weights so a
    # resumed fit can reuse them via loss_terms.
    path = str(tmp_path / "bal.msgpack")

    def beam(f, x):
        return D(D(D(D(f, x), x), x), x) - 384.0

    left = np.array([0.0], np.float32)
    s1 = Solver(beam, ndims=1, boundary_condition=0, seed=0,
                activation="Tanh", layout="fa fa f", features=[16, 16, 1],
                constraints=lambda f, x: f.grad(left, wrt=0))
    s1.fit(niters=300, batch_size=128, lr=0.01,
           loss_terms=["equation", "constraint_0"], loss_balancing=50,
           checkpoint_path=path, progress=False)
    s2 = Solver(beam, ndims=1, boundary_condition=0, seed=1,
                activation="Tanh", layout="fa fa f", features=[16, 16, 1],
                constraints=lambda f, x: f.grad(left, wrt=0))
    s2.load(path)
    wts = s2.last_balanced_weights
    assert wts is not None and len(wts) == 2
    assert wts[1] > 1.5  # the mis-scaled beam pushes constraint weight up
