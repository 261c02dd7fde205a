"""Round-3 hardening: divergence guard, bucketed inference, numpy-ufunc
symbols, `.ctx` migration shim (VERDICT round 2 items 3-5, 8)."""

import warnings

import numpy as np
import pytest

import pydens_tpu as pdt
from pydens_tpu import Solver, D


def _ode(f, x):
    return D(f, x) - 2 * np.pi * pdt.cos(2 * np.pi * x)


# ---------------------------------------------------------------------------
# solver.ctx migration shim + stacked-array model call
# ---------------------------------------------------------------------------

def test_ctx_run_reference_idiom():
    # The reference examples notebook calls solver.ctx.run(solver.model, xs)
    # with a ready (N, total) array; the shim must make that work verbatim.
    def pde(f, x, y):
        return D(D(f, x), x) + D(D(f, y), y) - 5 * pdt.sin(np.pi * (x + y))

    solver = Solver(pde, ndims=2, boundary_condition=1, seed=0)
    solver.fit(niters=5, batch_size=16, progress=False)
    xs = np.stack([np.linspace(0, 1, 40),
                   np.linspace(0, 1, 40)], axis=1).astype(np.float32)
    via_ctx = np.asarray(solver.ctx.run(solver.model, xs))
    assert via_ctx.shape == (40, 1)
    np.testing.assert_allclose(via_ctx, solver.predict(xs), atol=1e-6)
    # plain callables route through unchanged
    assert solver.ctx.run(lambda a, b: a + b, 1, 2) == 3


def test_model_call_stacked_vs_columns():
    def pde(f, x, y):
        return D(D(f, x), x) + D(D(f, y), y)

    solver = Solver(pde, ndims=2, boundary_condition=0, seed=0)
    solver.fit(niters=2, batch_size=16, progress=False)
    cols = (np.linspace(0, 1, 9), np.linspace(0, 1, 9))
    stacked = np.stack(cols, axis=1).astype(np.float32)
    np.testing.assert_allclose(np.asarray(solver.model(*cols)),
                               np.asarray(solver.model(stacked)), atol=1e-6)


# ---------------------------------------------------------------------------
# numpy-ufunc math on equation symbols (np.cos(x) stays symbolic)
# ---------------------------------------------------------------------------

def test_np_ufunc_equation_converges():
    # The reference docstring's ODE written with np.* math ONLY
    # (model_torch.py:207-211: D(f, x) - 2*pi*cos(2*pi*x)) must work
    # unchanged: np.cos on a coordinate symbol routes through lift.
    def ode(f, x):
        return D(f, x) - 2 * np.pi * np.cos(2 * np.pi * x)

    solver = Solver(ode, ndims=1, initial_condition=.5, seed=0,
                    activation="Tanh", layout="fafaf", features=[12, 10, 1])
    solver.fit(niters=400, batch_size=128, lr=0.02, progress=False)
    xs = np.linspace(0, 1, 50)
    err = np.max(np.abs(solver.predict(xs).ravel()
                        - (np.sin(2 * np.pi * xs) + .5)))
    assert err < 0.05, err


def test_np_ufunc_parametric_equation():
    # model_torch.py:218-221: parametric rhs with np math, e a parameter.
    def pde(f, x, e):
        return D(f, x) - e * np.pi * np.cos(e * np.pi * x)

    from pydens_tpu import NumpySampler as NS
    solver = Solver(pde, ndims=1, nparams=1, initial_condition=1, seed=0)
    solver.fit(niters=30, batch_size=64,
               sampler=NS("u") & NS("u", low=1, high=5), progress=False)
    assert np.isfinite(solver.losses).all()


def test_np_ufunc_product_rule_and_binary():
    # np.* subexpressions stay differentiable: D applies the product rule
    # through np.cos, and binary ufuncs (np.add with an array operand)
    # stay symbolic too.
    from pydens_tpu.ops.tokens import Expr, EvalContext, as_array

    leaves = [np.linspace(0.1, 1, 8, dtype=np.float32).reshape(-1, 1)]
    ctx = EvalContext(leaves)
    x = Expr(lambda ls: ls[0], ctx, leaf_index=0)
    y = D(np.cos(x) * x, x)  # d/dx (x cos x) = cos x - x sin x
    expected = np.cos(leaves[0]) - leaves[0] * np.sin(leaves[0])
    np.testing.assert_allclose(np.asarray(as_array(y)), expected, rtol=1e-5)
    z = np.add(np.ones((8, 1), np.float32), x)
    assert isinstance(z, Expr)
    np.testing.assert_allclose(np.asarray(as_array(z)), 1.0 + leaves[0],
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(as_array(np.log(x))),
                               np.log(leaves[0]), rtol=1e-5)


def test_np_ufunc_unsupported_raises_helpfully():
    from pydens_tpu.ops.tokens import Expr, EvalContext

    ctx = EvalContext([np.ones((2, 1), np.float32)])
    x = Expr(lambda ls: ls[0], ctx, leaf_index=0)
    with pytest.raises(TypeError, match="lift"):
        np.add.reduce(x)  # non-__call__ ufunc method
    with pytest.raises(TypeError, match="lift"):
        np.frompyfunc(lambda a: a, 1, 1)(x)  # no jnp equivalent


# ---------------------------------------------------------------------------
# Divergence guard (stop_on_nan)
# ---------------------------------------------------------------------------

def test_diverging_fit_stops_within_one_chunk():
    # SGD at lr=1e10 overflows the parameters within a couple of steps; the
    # device-side guard must exit the compiled loop at the first non-finite
    # loss instead of burning the remaining iterations.
    solver = Solver(_ode, ndims=1, initial_condition=.5, seed=0)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        solver.fit(niters=5000, batch_size=32, optimizer="SGD", lr=1e10,
                   chunk_size=5000, progress=False)
    msgs = [str(w.message) for w in caught]
    assert any("non-finite loss" in m for m in msgs), msgs
    rec = solver.history[-1]
    assert "stopped_on_nan" in rec
    # The guard stops AT the bad step: far fewer losses than requested, and
    # the last recorded loss is the non-finite evidence.
    assert len(solver.losses) < 100
    assert not np.isfinite(solver.losses[-1])
    assert rec["niters"] == len(solver.losses)
    assert rec["stopped_on_nan"] == len(solver.losses) - 1


# ---------------------------------------------------------------------------
# Shape-bucketed inference (no per-N recompiles)
# ---------------------------------------------------------------------------

def test_inference_grid_sweep_compiles_once():
    # Sweeping grid sizes must reuse ONE executable per inference entry:
    # inputs pad to the shape bucket (next pow2, floor 1024), outputs are
    # sliced back.  On a real TPU each avoided compile is tens of seconds.
    solver = Solver(_ode, ndims=1, initial_condition=.5, seed=0)
    solver.fit(niters=5, batch_size=16, progress=False)
    for n in (33, 100, 257, 1000):
        xs = np.linspace(0, 1, n)
        assert solver.predict(xs).shape == (n, 1)
        assert solver.residual(xs).shape == (n, 1)
        assert solver.predict_grad(xs).shape == (n, 1)
    assert solver.model._apply_jit._cache_size() == 1
    assert solver._residual_jit._cache_size() == 1
    assert solver._grad_jit._cache_size() == 1


def test_padded_inference_values_independent_of_batch():
    solver = Solver(_ode, ndims=1, initial_condition=.5, seed=0)
    solver.fit(niters=5, batch_size=16, progress=False)
    xs = np.linspace(0, 1, 33)
    big = np.concatenate([xs, np.linspace(0.3, 0.7, 500)])
    np.testing.assert_allclose(solver.predict(xs),
                               solver.predict(big)[:33], atol=1e-6)
    np.testing.assert_allclose(solver.residual(xs),
                               solver.residual(big)[:33], atol=1e-6)


def test_bucketed_inference_ensemble_shapes():
    solver = Solver(_ode, ndims=1, initial_condition=.5, seed=0, n_models=3)
    solver.fit(niters=5, batch_size=16, progress=False)
    xs = np.linspace(0, 1, 77)
    assert solver.predict(xs).shape == (77, 1)
    assert solver.predict_all(xs).shape == (3, 77, 1)
    assert solver.predict_std(xs).shape == (77, 1)
    assert solver.model._apply_jit_ensemble._cache_size() == 1


def test_pad_to_bucket_edges():
    from pydens_tpu.models.base import pad_to_bucket
    exact = np.zeros((1024, 2), np.float32)
    padded, n = pad_to_bucket(exact)
    assert padded is exact and n == 1024  # no copy at the bucket boundary
    padded, n = pad_to_bucket(np.arange(6, dtype=np.float32).reshape(3, 2))
    assert padded.shape == (1024, 2) and n == 3
    assert (padded[3:] == padded[2]).all()  # filler repeats the last row
    big = np.zeros((1025, 2), np.float32)
    assert pad_to_bucket(big)[0].shape == (2048, 2)


def test_finite_fit_unaffected_by_guard():
    solver = Solver(_ode, ndims=1, initial_condition=.5, seed=0,
                    activation="Tanh", layout="fafaf", features=[12, 10, 1])
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        solver.fit(niters=300, batch_size=128, lr=0.02, progress=False)
    assert not any("non-finite" in str(w.message) for w in caught)
    assert len(solver.losses) == 300
    assert "stopped_on_nan" not in solver.history[-1]
    assert solver.losses[-1] < 1e-2


def test_diverging_fit_stops_with_chunk_size_one():
    # Regression (round-3 review): a non-finite loss on a chunk's LAST
    # iteration exits the device loop with done == n — with chunk_size=1
    # EVERY iteration is a chunk's last, so the count alone can never
    # signal divergence; the returned ok flag must.
    solver = Solver(_ode, ndims=1, initial_condition=.5, seed=0)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        solver.fit(niters=50, batch_size=16, optimizer="SGD", lr=1e10,
                   chunk_size=1, progress=False)
    assert any("non-finite loss" in str(w.message) for w in caught)
    assert "stopped_on_nan" in solver.history[-1]
    assert len(solver.losses) < 10
    assert not np.isfinite(solver.losses[-1])


def test_stop_on_nan_false_runs_to_completion():
    solver = Solver(_ode, ndims=1, initial_condition=.5, seed=0)
    solver.fit(niters=50, batch_size=16, optimizer="SGD", lr=1e10,
               stop_on_nan=False, progress=False)
    assert len(solver.losses) == 50  # guard off: all iterations recorded
    assert not np.isfinite(solver.losses[-1])
    assert "stopped_on_nan" not in solver.history[-1]


def test_nan_stop_keeps_last_good_checkpoint(tmp_path):
    # The snapshot written before divergence must survive; the NaN carry
    # must never overwrite it.
    path = str(tmp_path / "ckpt.msgpack")
    good = Solver(_ode, ndims=1, initial_condition=.5, seed=0)
    good.fit(niters=20, batch_size=32, checkpoint_path=path, progress=False)
    good_losses = list(good.losses)

    bad = Solver(_ode, ndims=1, initial_condition=.5, seed=0)
    bad.load(path)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        bad.fit(niters=200, batch_size=32, optimizer="SGD", lr=1e10,
                checkpoint_path=path, chunk_size=50, progress=False)
    restored = Solver(_ode, ndims=1, initial_condition=.5, seed=0)
    restored.load(path)
    # The checkpoint still holds the pre-divergence state (finite params,
    # the good run's loss history).
    flat = np.concatenate([np.ravel(l) for l in
                           __import__("jax").tree.leaves(restored.params)])
    assert np.isfinite(flat).all()
    assert restored.losses == pytest.approx(good_losses)


# ---------------------------------------------------------------------------
# Review fixes: causal_axis validation, wrap-probe robustness, periodic
# argument validation (round-3 in-round review)
# ---------------------------------------------------------------------------

def _transport(f, x, t):
    return D(f, t) + D(f, x)


def test_causal_axis_without_causal_raises():
    # causal_axis=k alone must not silently train plain-MSE.
    solver = Solver(_transport, ndims=2, seed=0,
                    initial_condition=lambda x: pdt.sin(np.pi * x))
    with pytest.raises(ValueError, match="causal_axis"):
        solver.fit(niters=5, batch_size=16, causal_axis=1, progress=False)


def test_wrap_probe_accepts_clamped_tabulated_ic():
    # jnp.interp clamps flat outside its table: a genuinely wrap-compatible
    # tabulated IC must not be flagged (the probe may only sample inside
    # the domain).
    import jax.numpy as jnp
    xp = np.linspace(-1, 1, 201).astype(np.float32)
    fp = np.sin(np.pi * xp).astype(np.float32)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        solver = Solver(_transport, ndims=2, seed=0,
                        domain=[(-1, 1), (0, 1)], periodic=(0,),
                        initial_condition=lambda x: jnp.interp(x, xp, fp))
        solver.fit(niters=2, batch_size=8, progress=False)
    assert not [w for w in rec if "incompatible" in str(w.message)]


def test_wrap_probe_accepts_high_harmonics():
    # One-sided stencil truncation grows with harmonic content; the
    # interior-calibrated floor must keep sin(6*pi*x) unflagged while the
    # kinked Allen-Cahn IC still warns (covered in test_periodic).
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        solver = Solver(_transport, ndims=2, seed=0,
                        domain=[(-1, 1), (0, 1)], periodic=(0,),
                        initial_condition=lambda x: pdt.sin(6 * np.pi * x))
        solver.fit(niters=2, batch_size=8, progress=False)
    assert not [w for w in rec if "incompatible" in str(w.message)]


def test_negative_periodic_dim_raises():
    with pytest.raises(ValueError, match="not a spatial dimension"):
        Solver(_transport, ndims=2, seed=0, periodic={-1: 2},
               initial_condition=lambda x: pdt.sin(np.pi * x))


def test_ic_decay_without_periodic_raises():
    # periodic_ic_decay=True on a non-periodic model is a silent no-op
    # otherwise; False (the silencing spelling) stays allowed anywhere.
    with pytest.raises(ValueError, match="periodic_ic_decay"):
        Solver(_transport, ndims=2, seed=0, periodic_ic_decay=True,
               initial_condition=lambda x: pdt.sin(np.pi * x))
    Solver(_transport, ndims=2, seed=0, periodic_ic_decay=False,
           initial_condition=lambda x: pdt.sin(np.pi * x))


# ---------------------------------------------------------------------------
# Second review batch: probe robustness vs interior kinks, silent-lr and
# fast_taps validation
# ---------------------------------------------------------------------------

def test_wrap_probe_kink_at_calibration_point_still_flagged():
    # A tent IC centered exactly on a calibration fraction must not raise
    # the truncation floor to its own kink magnitude and mask the seam
    # slope jump (median floor over spread calibration points).
    from pydens_tpu.models.base import ConvBlockModel
    for center in (0.5, 0.4):
        m = ConvBlockModel(ndims=2, periodic=[0], features=(8, 8, 1),
                           initial_condition=lambda x, c=center:
                           np.abs(x - c))
        assert m._probe_ic_wrap_incompatible(), center


def test_wrap_probe_constant_vector_ic_clean():
    # A constant vector IC returns a non-batch shape; the probe must
    # broadcast it and return a clean False with no could-not-probe noise.
    from pydens_tpu.models.base import ConvBlockModel
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        m = ConvBlockModel(ndims=2, periodic=[0], features=(8, 8, 2),
                           initial_condition=[1.0, 2.0])
        assert m._probe_ic_wrap_incompatible() is False
    assert not [w for w in rec if "could not probe" in str(w.message)]


def test_lbfgs_ignored_lr_warns():
    solver = Solver(_ode, ndims=1, initial_condition=0.5, seed=0)
    with pytest.warns(UserWarning, match="linesearch"):
        solver.fit(niters=3, batch_size=32, optimizer="LBFGS", lr=0.1,
                   resample=False, progress=False)


def test_fast_taps_typo_raises():
    solver = Solver(_ode, ndims=1, initial_condition=0.5, seed=0)
    with pytest.raises(ValueError, match="fast_taps"):
        solver.fit(niters=3, batch_size=32, fast_taps="Never",
                   progress=False)
