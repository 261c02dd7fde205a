"""AOT export/serving artifact (``Solver.export`` / ``load_exported``) —
no reference counterpart (SURVEY §5: the reference has no persistence or
serving story)."""

import subprocess
import sys

import numpy as np
import pytest

import pydens_tpu as pdt
from pydens_tpu import Solver, D


def _trained_ode_solver():
    def ode(f, x):
        return D(f, x) - 2 * np.pi * pdt.cos(2 * np.pi * x)

    s = Solver(ode, ndims=1, initial_condition=0.5, seed=0,
               layout="fafaf", features=[12, 10, 1], activation="Tanh")
    s.fit(niters=300, batch_size=128, progress=False)
    return s


def test_export_roundtrip_matches_predict(tmp_path):
    s = _trained_ode_solver()
    path = tmp_path / "u.pdtx"
    blob = s.export(path)
    assert path.read_bytes() == blob

    fn = pdt.load_exported(path)
    # Batch dim is shape-polymorphic: exercise two different sizes.
    for n in (7, 64):
        xs = np.linspace(0, 1, n, dtype=np.float32).reshape(-1, 1)
        np.testing.assert_allclose(np.asarray(fn(xs)), s.predict(xs),
                                   rtol=1e-6, atol=1e-6)


def test_export_bakes_in_v_variables(tmp_path):
    # The artifact must carry trained V variables, not their init values.
    def ode(f, x):
        return D(f, x) - pdt.V("slope", 0.0)

    s = Solver(ode, ndims=1, initial_condition=0.0, seed=0,
               constraints=lambda f, x: f(np.array([1.0])) - 3.0)
    s.fit(niters=500, batch_size=64, lr=0.05,
          loss_terms=["equation", "constraint_0"], progress=False)
    fn = pdt.load_exported(s.export())
    xs = np.linspace(0, 1, 11, dtype=np.float32).reshape(-1, 1)
    np.testing.assert_allclose(np.asarray(fn(xs)), s.predict(xs),
                               rtol=1e-6, atol=1e-6)
    assert abs(float(fn(np.ones((1, 1), np.float32))[0, 0]) - 3.0) < 0.3


def test_export_ensemble_is_member_mean(tmp_path):
    def ode(f, x):
        return D(f, x) - 2 * np.pi * pdt.cos(2 * np.pi * x)

    s = Solver(ode, ndims=1, initial_condition=0.5, seed=0, n_models=3,
               layout="fa f", features=[8, 1])
    s.fit(niters=50, batch_size=64, progress=False)
    fn = pdt.load_exported(s.export())
    xs = np.linspace(0, 1, 9, dtype=np.float32).reshape(-1, 1)
    np.testing.assert_allclose(np.asarray(fn(xs)), s.predict(xs),
                               rtol=1e-6, atol=1e-6)


def test_export_mesh_trained_solver_is_topology_free(tmp_path):
    # A solver trained over a device mesh must export a single-device
    # artifact (params pulled to host, shardings dropped) — regression test
    # for the nr_devices=mesh-size lock-in.
    from pydens_tpu import make_mesh

    def ode(f, x):
        return D(f, x) - 2 * np.pi * pdt.cos(2 * np.pi * x)

    s = Solver(ode, ndims=1, initial_condition=0.5, seed=0,
               mesh=make_mesh(), layout="fa f", features=[8, 1])
    s.fit(niters=50, batch_size=64, progress=False)
    blob = s.export()
    from jax import export as jax_export
    exported = jax_export.deserialize(blob[len(b"PDTPUEXP1"):])
    assert exported.nr_devices == 1
    fn = pdt.load_exported(blob)
    xs = np.linspace(0, 1, 9, dtype=np.float32).reshape(-1, 1)
    np.testing.assert_allclose(np.asarray(fn(xs)), s.predict(xs),
                               rtol=1e-6, atol=1e-6)


def test_export_lowered_for_all_mainstream_platforms():
    s = _trained_ode_solver()
    from jax import export as jax_export
    exported = jax_export.deserialize(s.export()[len(b"PDTPUEXP1"):])
    assert set(exported.platforms) >= {"cpu", "tpu"}


def test_export_untrained_solver_requires_params():
    s = _trained_ode_solver()
    s.model.params = None
    with pytest.raises(ValueError, match="no parameters"):
        s.export()


def test_artifact_loads_in_bare_jax_process(tmp_path):
    # The serving side needs only jax: deserialize the raw StableHLO blob
    # (after the magic) without importing pydens_tpu at all.
    s = _trained_ode_solver()
    path = tmp_path / "u.pdtx"
    s.export(path)
    expected = float(s.predict(np.array([0.25]))[0, 0])
    code = f"""
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from jax import export
blob = open({str(path)!r}, "rb").read()
fn = export.deserialize(blob[len(b"PDTPUEXP1"):])
out = fn.call(np.array([[0.25]], np.float32))
assert abs(float(out[0, 0]) - {expected!r}) < 1e-5, out
print("OK")
"""
    proc = subprocess.run([sys.executable, "-c", code],
                          capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stderr
    assert "OK" in proc.stdout


def test_export_with_grad_matches_predict_grad(tmp_path):
    s = _trained_ode_solver()
    fn = pdt.load_exported(s.export(with_grad=True))
    xs = np.linspace(0, 1, 11, dtype=np.float32).reshape(-1, 1)
    u, du = fn(xs)
    np.testing.assert_allclose(np.asarray(u), s.predict(xs),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(du)[:, :, 0], s.predict_grad(xs), rtol=1e-5, atol=1e-5)


def test_export_branched_layout_roundtrip(tmp_path):
    # Branch sub-network params (br1_*) and multi-head outputs survive the
    # AOT export artifact unchanged.
    def system(f, x):
        u, v = f[:, 0:1], f[:, 1:2]
        return (D(u, x) - v, D(v, x) + u)

    s = Solver(system, ndims=1, seed=0, activation="Tanh",
               layout="fa B f .", features=[12, 1],
               branches=[dict(layout="f", features=[1])],
               initial_condition=np.array([0.0, 1.0]))
    s.fit(niters=30, batch_size=32, progress=False)
    xs = np.linspace(0, 1, 21, dtype=np.float32)
    want = s.predict(xs)
    assert want.shape == (21, 2)
    fn = pdt.load_exported(s.export(str(tmp_path / "branched.bin")))
    np.testing.assert_allclose(np.asarray(fn(xs.reshape(-1, 1))), want,
                               rtol=1e-5, atol=1e-6)
