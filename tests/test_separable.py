"""Separable PINN model (SPINN-style per-axis factorization): pointwise ==
grid forward consistency, end-to-end convergence in 2D/3D, the grid-probe
guard against axis-collapsing equations, and the validation matrix."""

import numpy as np
import jax.numpy as jnp
import pytest

import pydens_tpu as pdt
from pydens_tpu import Solver, D, V, SeparableModel


def _poisson2(f, x, y):
    return (D(D(f, x), x) + D(D(f, y), y)
            + 2 * np.pi ** 2 * pdt.sin(np.pi * x) * pdt.sin(np.pi * y))


def test_pointwise_equals_grid_forward():
    # Same parameters, two evaluation paths (stacked pointwise product vs
    # factorized einsum + grid ansatz) — must agree exactly.  Pins
    # anzatc_grid to Model.anzatc.
    def pde(f, x, y):
        return D(D(f, x), x) + D(D(f, y), y) - f

    s = Solver(pde, ndims=2, boundary_condition=lambda x, y: x + 2 * y,
               model=SeparableModel, layout="fa f", features=[16, 8], seed=1)
    ax = np.linspace(0, 1, 7).astype(np.float32)
    ay = np.linspace(0, 1, 5).astype(np.float32)
    leaves = [jnp.asarray(ax).reshape(7, 1, 1),
              jnp.asarray(ay).reshape(1, 5, 1)]
    grid = np.asarray(s.model.apply_leaves(s.model.params, leaves))
    X, Y = np.meshgrid(ax, ay, indexing="ij")
    pw = s.model(np.stack([X.ravel(), Y.ravel()], 1)).reshape(7, 5, 1)
    np.testing.assert_allclose(grid, pw, atol=1e-5)
    # predict_grid routes the same factorized path (with axis bucketing).
    pg = s.predict_grid(ax, ay)
    np.testing.assert_allclose(pg, pw, atol=1e-5)


def test_poisson_2d_converges():
    s = Solver(_poisson2, ndims=2, boundary_condition=0.0,
               model=SeparableModel, layout="fa fa f",
               features=[32, 32, 32], activation="Tanh", seed=0)
    s.fit(niters=500, batch_size=64, lr=2e-3, progress=False)
    xs = np.linspace(0, 1, 41)
    X, Y = np.meshgrid(xs, xs, indexing="ij")
    pred = s.predict(X.ravel(), Y.ravel()).reshape(41, 41)
    true = np.sin(np.pi * X) * np.sin(np.pi * Y)
    rel = np.linalg.norm(pred - true) / np.linalg.norm(true)
    assert rel < 0.02, rel


def test_poisson_3d_converges():
    # The separable showcase: 32**3 = 32768 collocation points per
    # iteration at the network cost of 3 x 32-row MLP evals.
    def pde(f, x, y, z):
        return (D(D(f, x), x) + D(D(f, y), y) + D(D(f, z), z)
                + 3 * np.pi ** 2 * pdt.sin(np.pi * x) * pdt.sin(np.pi * y)
                * pdt.sin(np.pi * z))

    s = Solver(pde, ndims=3, boundary_condition=0.0, model=SeparableModel,
               layout="fa fa f", features=[32, 32, 32], activation="Tanh",
               seed=0)
    s.fit(niters=400, batch_size=32, lr=2e-3, progress=False)
    xs = np.linspace(0, 1, 17)
    pred = s.predict_grid(xs, xs, xs)[..., 0]
    X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
    true = np.sin(np.pi * X) * np.sin(np.pi * Y) * np.sin(np.pi * Z)
    rel = np.linalg.norm(pred - true) / np.linalg.norm(true)
    assert rel < 0.03, rel


def test_heat_periodic_ic_binding():
    def heat(f, x, t):
        return D(f, t) - 0.25 * D(D(f, x), x)

    s = Solver(heat, ndims=2, model=SeparableModel, domain=[(0, 1), (0, 1)],
               initial_condition=lambda x: pdt.sin(2 * np.pi * x),
               periodic=(0,), layout="fa fa f", features=[24, 24, 24],
               activation="Tanh", seed=0)
    xs = np.linspace(0, 1, 33)
    # IC binds exactly at t0 before any training (ansatz property).
    np.testing.assert_allclose(
        s.predict(xs, np.zeros_like(xs)).ravel(),
        np.sin(2 * np.pi * xs), atol=1e-5)
    s.fit(niters=800, batch_size=48, lr=2e-3, progress=False)
    true = (np.exp(-0.25 * 4 * np.pi ** 2 * 0.5) * np.sin(2 * np.pi * xs))
    err = np.abs(s.predict(xs, np.full_like(xs, 0.5)).ravel() - true).max()
    assert err < 0.02, err


def test_system_slicing_grid_probe():
    # f[..., k] (portable spelling) builds; the reference's pointwise
    # f[:, k] collapses a grid axis and must be rejected at construction.
    def good(f, x, t):
        u, v = f[..., 0:1], f[..., 1:2]
        return (D(u, t) - v, D(v, t) + u)

    s = Solver(good, ndims=2, model=SeparableModel, n_out=2,
               initial_condition=np.array([0.0, 1.0]),
               layout="fa f", features=[16, 8], seed=0)
    s.fit(niters=20, batch_size=16, progress=False)
    assert np.isfinite(s.losses).all()

    def bad(f, x, t):
        u, v = f[:, 0:1], f[:, 1:2]
        return (D(u, t) - v, D(v, t) + u)

    with pytest.raises(ValueError, match=r"f\[\.\.\., k"):
        Solver(bad, ndims=2, model=SeparableModel, n_out=2,
               initial_condition=np.array([0.0, 1.0]),
               layout="fa f", features=[16, 8], seed=0)


def test_v_token_and_fixed_batch():
    # V tokens ride the same variables registry; resample=False (fixed
    # per-axis points) works for the L-BFGS-style finishing flow.
    def pde(f, x):
        return D(f, x) - V("a", 2.0) * x

    s = Solver(pde, ndims=1, model=SeparableModel, initial_condition=0.0,
               layout="fa f", features=[12, 6], seed=0)
    s.fit(niters=30, batch_size=32, progress=False)
    s.fit(niters=30, batch_size=32, resample=False, optimizer=None,
          progress=False)
    assert np.isfinite(s.losses).all() and "a" in s.params["variables"]


def test_separable_validation_errors():
    s = Solver(_poisson2, ndims=2, boundary_condition=0.0,
               model=SeparableModel, layout="fa f", features=[8, 4], seed=0)
    with pytest.raises(ValueError, match="adaptive"):
        s.fit(niters=1, batch_size=8, adaptive=4, progress=False)
    with pytest.raises(ValueError, match="rba|per flat batch"):
        s.fit(niters=1, batch_size=8, resample=False, rba=True,
              progress=False)
    with pytest.raises(ValueError, match="fourier_features"):
        Solver(_poisson2, ndims=2, boundary_condition=0.0,
               model=SeparableModel, fourier_features=8)
    with pytest.raises(ValueError, match="arch"):
        Solver(_poisson2, ndims=2, boundary_condition=0.0,
               model=SeparableModel, arch="modified")
def test_causal_grid_zero_equals_plain_and_runs():
    # Grid causal weighting: exact per-time-slice means instead of the
    # pointwise 32-bin histogram; eps=0 must reduce to plain MSE exactly
    # and a positive eps must train finitely.
    def conv(f, x, t):
        return D(f, t) + 2.0 * D(f, x)

    def mk():
        return Solver(conv, ndims=2, model=SeparableModel, periodic=(0,),
                      initial_condition=lambda x: pdt.sin(2 * np.pi * x),
                      layout="fa fa f", features=[16, 16, 16],
                      activation="Tanh", seed=0)

    a = mk()
    a.fit(niters=50, batch_size=24, progress=False)
    b = mk()
    b.fit(niters=50, batch_size=24, causal=0.0, progress=False)
    np.testing.assert_allclose(a.losses, b.losses, rtol=1e-5, atol=1e-7)
    c = mk()
    c.fit(niters=50, batch_size=24, causal=5.0, progress=False)
    assert np.isfinite(c.losses).all()


def test_mesh_grid_data_parallel_matches_single():
    # Grid DP shards grid axis 0 across the mesh; same seed/config must
    # reproduce the unsharded trajectory (XLA inserts the psum for the
    # loss mean — numerics match to reduction-order noise).
    from pydens_tpu.parallel import make_mesh

    def run(mesh):
        s = Solver(_poisson2, ndims=2, boundary_condition=0.0,
                   model=SeparableModel, layout="fa f", features=[16, 8],
                   seed=0, mesh=mesh)
        s.fit(niters=40, batch_size=16, progress=False)
        return np.asarray(s.losses)

    np.testing.assert_allclose(run(None), run(make_mesh()),
                               rtol=2e-4, atol=1e-6)


def test_parametric_axis():
    # nparams columns become extra grid axes: the whole parameter family
    # trains on a (x, e) tensor grid (param axis sampled U(0,1)).
    def pde(f, x, e):
        return D(f, x) - e

    s = Solver(pde, ndims=1, nparams=1, model=SeparableModel,
               initial_condition=0.0, layout="fa fa f",
               features=[16, 16, 16], activation="Tanh", seed=0)
    s.fit(niters=400, batch_size=32, lr=2e-3, progress=False)
    xs = np.linspace(0, 1, 9)
    for e in (0.2, 0.8):
        pred = s.predict(xs, np.full_like(xs, e)).ravel()
        np.testing.assert_allclose(pred, e * xs, atol=0.02)


def test_checkpoint_roundtrip(tmp_path):
    s = Solver(_poisson2, ndims=2, boundary_condition=0.0,
               model=SeparableModel, layout="fa f", features=[12, 6], seed=0)
    s.fit(niters=40, batch_size=16, progress=False)
    p = str(tmp_path / "sep_ckpt")
    s.save(p)
    s2 = Solver(_poisson2, ndims=2, boundary_condition=0.0,
                model=SeparableModel, layout="fa f", features=[12, 6],
                seed=7)
    s2.load(p)
    xs = np.linspace(0, 1, 9)
    np.testing.assert_allclose(s2.predict(xs, xs), s.predict(xs, xs),
                               rtol=1e-6)


def test_export_roundtrip():
    # The serving path is the pointwise product form — the same
    # shape-polymorphic export artifact works for separable models.
    from pydens_tpu import load_exported
    s = Solver(_poisson2, ndims=2, boundary_condition=0.0,
               model=SeparableModel, layout="fa f", features=[12, 6], seed=0)
    s.fit(niters=30, batch_size=16, progress=False)
    fn = load_exported(s.export())
    xs = np.random.default_rng(0).random((17, 2), dtype=np.float32)
    np.testing.assert_allclose(fn(xs), s.predict(xs), rtol=1e-5, atol=1e-6)


def test_predict_grid_fallback_pointwise_model():
    # Non-separable models get the meshgrid+predict fallback with the same
    # output contract.
    ode = lambda f, x: D(f, x) - 1.0
    s = Solver(ode, ndims=1, initial_condition=0.0, seed=0)
    xs = np.linspace(0, 1, 5)
    out = s.predict_grid(xs)
    np.testing.assert_allclose(out[:, 0], s.predict(xs).ravel(), rtol=1e-6)


def test_separable_rejects_branch_layout_tokens():
    # The factorization widens the last dense layer to rank*n_out; branch/
    # concat tokens would silently break that — clear error instead.
    for bad in (dict(layout="fa B f ."), dict(branches=[None])):
        with pytest.raises(ValueError, match="chain MLPs"):
            SeparableModel(ndims=2, **bad)
