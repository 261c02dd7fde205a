"""Regression tests for round-2 review fixes (VERDICT.md weak items 6-9 and
ADVICE.md findings)."""

import numpy as np
import pytest

import jax
import pydens_tpu as pdt
from pydens_tpu import Solver, D, GeometrySampler


def _ode(f, x):
    return D(f, x) - 2 * np.pi * pdt.cos(2 * np.pi * x)


# -- checkpoint completeness (VERDICT weak #6 / next-round #7) ---------------

def test_resume_reproduces_uninterrupted_continuation(tmp_path):
    # save mid-training -> load into a FRESH solver -> continue: the
    # continuation must equal the saving solver's own continuation exactly
    # (same restored params, Adam moments, RNG key and step counter).
    path = str(tmp_path / "ckpt.msgpack")
    s1 = Solver(_ode, ndims=1, initial_condition=.5, seed=0)
    s1.fit(niters=200, batch_size=128, progress=False)
    s1.save(path)
    s1.fit(niters=150, batch_size=128, optimizer=None, progress=False)

    s2 = Solver(_ode, ndims=1, initial_condition=.5, seed=9)
    s2.load(path)
    # default fit() builds a fresh Adam and grafts the checkpointed moments
    s2.fit(niters=150, batch_size=128, progress=False)
    np.testing.assert_allclose(s2.losses[200:], s1.losses[200:], rtol=1e-6)


def test_checkpoint_restores_history_freeze_and_key(tmp_path):
    path = str(tmp_path / "ckpt.msgpack")
    s1 = Solver(_ode, ndims=1, initial_condition=.5, seed=0)
    s1.fit(niters=20, batch_size=32, progress=False)
    s1.model.freeze_trainable(variables=("log_scale",))
    s1.save(path)

    s2 = Solver(_ode, ndims=1, initial_condition=.5, seed=5)
    s2.load(path)
    assert len(s2.history) == 1 and s2.history[0]["niters"] == 20
    assert "log_scale" in s2.model._frozen_variables
    assert s2._step_counter == 20
    k1 = jax.random.key_data(s1._key)
    k2 = jax.random.key_data(s2._key)
    np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))


def test_checkpoint_opt_state_warning_on_mismatch(tmp_path):
    # A checkpoint saved with Adam loaded into a fit with a structurally
    # different optimizer must warn, not crash or silently drop.
    path = str(tmp_path / "ckpt.msgpack")
    s1 = Solver(_ode, ndims=1, initial_condition=.5, seed=0)
    s1.fit(niters=10, batch_size=32, progress=False)
    s1.save(path)

    s2 = Solver(_ode, ndims=1, initial_condition=.5, seed=0)
    s2.load(path)
    assert s2._pending_opt_state is not None
    with pytest.warns(UserWarning, match="optimizer state is incompatible"):
        s2.fit(niters=5, batch_size=32, optimizer="SGD", progress=False)
    assert s2._pending_opt_state is None


def test_resume_into_warm_solver_preserves_moments(tmp_path):
    # load() into an already-fitted solver must also restore Adam moments on
    # the next fit (round-2 review finding: the warm path silently dropped
    # them).  Continuation must equal the saving solver's own continuation.
    path = str(tmp_path / "ckpt.msgpack")
    s1 = Solver(_ode, ndims=1, initial_condition=.5, seed=0)
    s1.fit(niters=200, batch_size=128, progress=False)
    s1.save(path)
    s1.fit(niters=100, batch_size=128, optimizer=None, progress=False)

    s2 = Solver(_ode, ndims=1, initial_condition=.5, seed=3)
    s2.fit(niters=50, batch_size=128, progress=False)  # warm it up
    s2.load(path)
    assert s2._pending_opt_state is not None
    s2.fit(niters=100, batch_size=128, progress=False)
    np.testing.assert_allclose(s2.losses[200:], s1.losses[200:], rtol=1e-6)


# -- loss-term validation (ADVICE #2) -----------------------------------------

def test_loss_terms_dict_typo_raises():
    solver = Solver(_ode, ndims=1, seed=0)
    with pytest.raises(ValueError, match="unknown loss term"):
        solver.fit(niters=1, batch_size=8, loss_terms={"equatoin": 1.0},
                   progress=False)


def test_loss_terms_list_keeps_reference_quirk():
    # The list form silently drops non-'constraint' unknowns, as the
    # reference does (model_torch.py:447-449).
    solver = Solver(_ode, ndims=1, seed=0)
    solver.fit(niters=2, batch_size=8, loss_terms=["equation", "equatoin"],
               progress=False)
    assert np.isfinite(solver.losses).all()


# -- GeometrySampler visibility (VERDICT weak #9 / ADVICE #3) -----------------

def test_geometry_sampler_zero_valid_is_nan():
    empty = GeometrySampler(lambda p: (p ** 2).sum(-1) < -1.0,  # never true
                            bbox=[(-1, 1), (-1, 1)])
    pts = np.asarray(empty.sample_device(jax.random.key(0), 16))
    assert np.isnan(pts).all()


def test_geometry_sampler_duplication_rate():
    disk = GeometrySampler(lambda p: (p ** 2).sum(-1) <= 1.0,
                           bbox=[(-1, 1), (-1, 1)], oversample=4, seed=0)
    assert disk.duplication_rate(64) == 0.0  # ~pi/4 acceptance, 4x oversample

    thin = GeometrySampler(lambda p: np.abs(p[..., 1]) < 0.01,
                           bbox=[(-1, 1), (-1, 1)], oversample=2, seed=0)
    rate = thin.duplication_rate(64)
    assert 0.9 < rate <= 1.0  # ~1% acceptance: almost all duplicates


def test_geometry_sampler_diagnostic_is_read_only():
    # The diagnostic must not advance the sampler's seeded RNG stream.
    def make():
        return GeometrySampler(lambda p: (p ** 2).sum(-1) <= 1.0,
                               bbox=[(-1, 1), (-1, 1)], seed=42)

    s1, s2 = make(), make()
    s1.duplication_rate(64)
    np.testing.assert_array_equal(s1.sample(32), s2.sample(32))


def test_taylor_third_order_closure_enforced():
    from pydens_tpu.models.layout import make_layout_network
    import jax

    init, apply, _ = make_layout_network("fa f", [8, 1], "Tanh", in_dim=1)
    params = init(jax.random.key(0))
    x = np.zeros((4, 1), np.float32)
    with pytest.raises(ValueError, match="sub-pair"):
        apply.taylor(params, x, [0], [], third_triples=[(0, 0, 0)])


def test_fast_taps_auto_counts_ensemble():
    # n_models scales the Taylor state K-fold: a batch under the auto
    # threshold for one model must flip to the fallback for an ensemble.
    def pde(f, x):
        return D(D(f, x), x) - 1.0

    s1 = Solver(pde, ndims=1, seed=0, layout="fafaf", features=[16, 16, 1])
    s8 = Solver(pde, ndims=1, seed=0, layout="fafaf", features=[16, 16, 1],
                n_models=8)
    batch = 20_000  # 20k * 4 blocks * width 16 = 1.28M <= 2M; 8x is over
    assert s1._auto_use_plan(batch) is True
    assert s8._auto_use_plan(batch) is False
    assert s1._auto_use_plan(100) is True
    assert s1._auto_use_plan(500_000) is False


def test_numpy_shim_star_import():
    ns = {}
    exec("from pydens_tpu.numpy import *", ns)
    assert "cos" in ns and "linspace" in ns
    out = ns["cos"](np.zeros(3))
    np.testing.assert_allclose(np.asarray(out), 1.0)


# -- reshape_and_concat torch quirk (VERDICT weak #7) -------------------------

def test_reshape_and_concat_torch_mismatch_raises():
    torch = pytest.importorskip("torch")
    with pytest.raises(ValueError, match="torch tensor"):
        Solver.reshape_and_concat([np.zeros(8), torch.zeros(3)])
    # matched sizes still concatenate
    out = Solver.reshape_and_concat([np.zeros(4), torch.ones(4)])
    assert out.shape == (4, 2)
    # numpy arrays keep the first-element tiling quirk
    out = Solver.reshape_and_concat([np.zeros(8), np.arange(3.0)])
    assert out.shape == (8, 2) and (out[:, 1] == 0.0).all()


# -- lazy freeze validation (VERDICT weak #8) ---------------------------------

def test_pre_init_freeze_typo_raises_on_mask_build():
    from pydens_tpu.models import ConvBlockModel

    model = ConvBlockModel(ndims=1)
    assert model.params is None
    model.freeze_trainable(layers=["not_a_layer"])  # silently accepted...
    params = model.init_params(jax.random.key(0))
    with pytest.raises(AttributeError, match="not_a_layer"):
        model.trainable_mask(params)  # ...but validated at mask build


def test_post_init_freeze_typo_raises_immediately():
    solver = Solver(_ode, ndims=1, seed=0)
    with pytest.raises(AttributeError, match="unknown"):
        solver.model.freeze_trainable(layers=["nope"])
    with pytest.raises(AttributeError, match="unknown"):
        solver.model.freeze_trainable(variables=["nope"])
