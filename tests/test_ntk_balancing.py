"""NTK-trace loss balancing (fit(loss_balancing='ntk')): the Hutchinson
trace estimator must match exact residual-Jacobian traces, the learned
weights must follow the anchored inverse-trace rule, and the mode must
rescue the same mis-scaled losses the grad-norm mode does.  Reference for
the scheme: Wang/Yu/Perdikaris, arXiv 2007.14527 §4 (lambda_j ∝ 1/tr(K_j));
the reference framework (model_torch.py) has no balancing at all — both
modes are supersets."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pydens_tpu.solver as solver_mod
from pydens_tpu import D, Solver
from pydens_tpu.solver import _unflatten

LEFT = np.array([0.0], np.float32)
RIGHT = np.array([1.0], np.float32)
CONS = (lambda f, x: f.grad(LEFT, wrt=0),
        lambda f, x: f.grad(RIGHT, wrt=0))
LT1 = {"equation": 1.0, "constraint_0": 1.0, "constraint_1": 1.0}
XS = np.linspace(0, 1, 101)
TRUE = 16.0 * XS ** 2 * (1 - XS) ** 2


def _beam_solver(equation, features=(24, 24, 1)):
    return Solver(equation, ndims=1, boundary_condition=0, seed=0,
                  layout="fa fa f", features=list(features),
                  activation="Tanh", constraints=CONS)


def beam_raw(f, x):
    return D(D(D(D(f, x), x), x), x) - 384.0


class _FixedSampler:
    """Host sampler returning a preset batch — makes the collocation
    points of a resample=False fit exactly reproducible in the test."""

    def __init__(self, pts):
        self.pts = np.asarray(pts, np.float32)

    def sample(self, size):
        assert size <= len(self.pts)
        return self.pts[:size]


def _exact_expected_weights(s, pts, w0=(1.0, 1.0, 1.0)):
    """One EMA step of the anchored inverse-trace rule, with tr(K_j)
    computed EXACTLY via jax.jacfwd on the solver's own per-term residual
    blocks (the object the estimator probes)."""
    mse = lambda a, b: jnp.mean((a - b) ** 2)
    _, _, resvec_fn = s._build_loss_fn(
        (("equation", 1.0), ("constraint_0", 1.0), ("constraint_1", 1.0)),
        mse)
    spec = s._flatten_spec()
    leaves = [jnp.asarray(pts[:, c:c + 1]) for c in range(s.model.total)]

    def blocks_flat(th):
        return resvec_fn.term_blocks(_unflatten(spec, th), leaves)

    theta = s._flatten_jit(s.model.params)
    jac = jax.jacfwd(blocks_flat)(theta)
    traces = np.array([float(jnp.sum(j * j)) for j in jac])
    lam = np.clip(traces[0] / (traces + 1e-12), 0.01, 100.0)
    lam[0] = 1.0
    return 0.7 * np.asarray(w0) + 0.3 * lam, traces


def test_ntk_weights_match_exact_traces(monkeypatch):
    # lr=0 keeps theta at init; a fixed host batch + resample=False makes
    # the rebalance operate on exactly the points the test re-uses for the
    # exact-Jacobian computation; 64 probes shrink the Hutchinson noise so
    # the single EMA step must land on 0.7*w0 + 0.3*clip(tr_eq/tr_j).
    monkeypatch.setattr(solver_mod, "_NTK_PROBES", 64)
    rng = np.random.default_rng(3)
    pts = rng.uniform(0, 1, size=(128, 1)).astype(np.float32)

    s = _beam_solver(beam_raw, features=(12, 12, 1))
    s.fit(niters=1, batch_size=128, lr=0.0, loss_terms=LT1,
          sampler=_FixedSampler(pts), resample=False,
          loss_balancing=("ntk", 1), progress=False)
    wts = np.asarray(s.history[-1]["balanced_weights"])

    expected, traces = _exact_expected_weights(s, pts)
    assert traces[0] > 0 and np.all(traces > 0), traces
    assert wts[0] == 1.0, wts  # the equation anchor never moves
    np.testing.assert_allclose(wts, expected, rtol=0.15)


@pytest.mark.slow
def test_ntk_balancing_rescues_misscaled_equation():
    # Same failure mode the grad-norm test pins: the O(384) beam residual
    # drowns the clamping constraints at unit weights.  The NTK mode must
    # recover them too.
    balanced = _beam_solver(beam_raw)
    balanced.fit(niters=2500, batch_size=512, lr=0.01, loss_terms=LT1,
                 loss_balancing="ntk", progress=False)
    err = np.max(np.abs(balanced.predict(XS).ravel() - TRUE))
    assert err < 0.01, err
    wts = balanced.history[-1]["balanced_weights"]
    assert wts[0] == 1.0 and min(wts[1:]) > 10.0, wts


def test_ntk_balancing_composes_with_freeze_and_ensemble():
    # Frozen coordinates are masked out of the probe vectors; ensembles
    # vmap the trace estimate with per-model probe keys.
    s = Solver(beam_raw, ndims=1, boundary_condition=0, seed=0,
               layout="fa fa f", features=[10, 10, 1], activation="Tanh",
               constraints=CONS, n_models=2)
    s.model.freeze_trainable(layers=["fc1"])
    s.fit(niters=60, batch_size=64, lr=0.005, loss_terms=LT1,
          loss_balancing=("ntk", 20), progress=False)
    wts = np.asarray(s.history[-1]["balanced_weights"])
    assert wts.shape == (3,) and wts[0] == 1.0
    assert np.all(np.isfinite(wts)) and min(wts[1:]) > 1.0, wts


def test_ntk_balancing_composes_with_separable():
    # The trace estimator runs on the shared _build_loss_fn term blocks,
    # so the separable (grid-leaf) path must produce finite anchored
    # weights too: residual blocks are the broadcast grid residuals
    # flattened, constraints stay pointwise.
    from pydens_tpu import SeparableModel

    def poisson(f, x, y):
        return D(D(f, x), x) + D(D(f, y), y) - 1.0

    s = Solver(poisson, ndims=2, boundary_condition=0, seed=0,
               model=SeparableModel, layout="fa f", features=[16, 8],
               constraints=(lambda f, x, y: f.grad(
                   np.array([0.5], np.float32),
                   np.array([0.5], np.float32), wrt=0),))
    s.fit(niters=40, batch_size=16, lr=0.005,
          loss_terms={"equation": 1.0, "constraint_0": 1.0},
          loss_balancing=("ntk", 10), progress=False)
    wts = np.asarray(s.history[-1]["balanced_weights"])
    assert wts.shape == (2,) and wts[0] == 1.0
    assert np.all(np.isfinite(wts)) and wts[1] > 0, wts


def test_system_term_block_matches_loss_term():
    """For a k-residual system, ``sum(eq_block**2)`` must equal the loss
    equation term (a sum of per-residual MEANS) — a whole-block
    1/sqrt(total_size) scaling made it 1/k of the term and biased
    tr(K_eq) low by k (round-4 review fix)."""
    def system(f, x):
        u, v = f[:, 0:1], f[:, 1:2]
        return (D(u, x) - v, D(v, x) + u)

    s = Solver(system, ndims=1, seed=0, layout="fa f", features=[8, 2],
               initial_condition=lambda *a: np.array([0.0, 1.0]),
               constraints=(lambda f, x: f.grad(RIGHT, wrt=0),))
    mse = lambda a, b: jnp.mean((a - b) ** 2)
    loss_fn, _, resvec_fn = s._build_loss_fn(
        (("equation", 1.0), ("constraint_0", 1.0)), mse)
    pts = np.random.default_rng(5).uniform(0, 1, (32, 1)).astype(np.float32)
    leaves = [jnp.asarray(pts)]
    params = s.model.params
    blocks = resvec_fn.term_blocks(params, leaves)
    eq_term = float(loss_fn(params, leaves,
                            term_weights=jnp.asarray([1.0, 0.0])))
    np.testing.assert_allclose(float(jnp.sum(blocks[0] ** 2)), eq_term,
                               rtol=1e-5)
    con_term = float(loss_fn(params, leaves,
                             term_weights=jnp.asarray([0.0, 1.0])))
    np.testing.assert_allclose(float(jnp.sum(blocks[1] ** 2)), con_term,
                               rtol=1e-5)


def test_ntk_balancing_validation():
    s = _beam_solver(beam_raw, features=(8, 8, 1))
    with pytest.raises(ValueError, match="not recognized"):
        s.fit(niters=10, batch_size=16, loss_terms=LT1,
              loss_balancing="spectral", progress=False)
    with pytest.raises(ValueError, match="exactly two"):
        s.fit(niters=10, batch_size=16, loss_terms=LT1,
              loss_balancing=("ntk", 100, 7), progress=False)
    with pytest.raises(ValueError, match="MSE"):
        s.fit(niters=10, batch_size=16, loss_terms=LT1,
              loss_balancing="ntk", criterion="L1Loss", progress=False)
    # A custom CALLABLE criterion must be rejected too: the traces would
    # balance an MSE the fit never minimizes (round-4 review fix).
    with pytest.raises(ValueError, match="MSE"):
        s.fit(niters=10, batch_size=16, loss_terms=LT1,
              loss_balancing="ntk",
              criterion=lambda a, b: jnp.mean(jnp.abs(a - b)),
              progress=False)
    with pytest.raises(ValueError, match="rba"):
        s.fit(niters=10, batch_size=16, loss_terms=LT1, rba=True,
              loss_balancing="ntk", progress=False)

    def heat(f, x, t):
        return D(f, t) - 0.1 * D(D(f, x), x)

    st = Solver(heat, ndims=2, initial_condition=lambda x: 0 * x, seed=0,
                constraints=(lambda f, x, t: f.grad(LEFT, LEFT, wrt=0),))
    with pytest.raises(ValueError, match="causal"):
        st.fit(niters=10, batch_size=16, causal=1.0,
               loss_terms={"equation": 1.0, "constraint_0": 1.0},
               loss_balancing="ntk", progress=False)
    # The explicit ('grad', k) spelling is accepted and behaves like k.
    s.fit(niters=20, batch_size=32, lr=0.005, loss_terms=LT1,
          loss_balancing=("grad", 10), progress=False)
    assert s.history[-1]["balanced_weights"] is not None
