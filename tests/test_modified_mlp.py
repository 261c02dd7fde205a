"""Gated "modified MLP" architecture (`arch='modified'`).

Wang–Sankaran–Perdikaris's improved PINN architecture: two encoder
streams mixed into every hidden layer by a pointwise gate.  No reference
counterpart (pydens builds plain chains only).  The Taylor fast path
propagates through the gate product by the general Leibniz rule —
differential-tested here against nested jvp (the project invariant for
anything touching derivative planning).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import pydens_tpu as pdt
from pydens_tpu import Solver, D
from pydens_tpu.models import ConvBlockModel
from pydens_tpu.models.layout import make_modified_mlp_network


def test_structure_and_validation():
    init, apply, names = make_modified_mlp_network([8, 8, 1], "Tanh",
                                                   in_dim=2)
    assert names == ["fcu", "fcw", "fc1", "fc2", "fc3"]
    params = init(jax.random.key(0))
    assert params["fcu"]["w"].shape == (2, 8)
    assert params["fc1"]["w"].shape == (2, 8)   # first gate reads input
    assert params["fc2"]["w"].shape == (8, 8)
    assert params["fc3"]["w"].shape == (8, 1)
    out = apply(params, jnp.zeros((4, 2)))
    assert out.shape == (4, 1)

    with pytest.raises(ValueError, match="equal hidden widths"):
        make_modified_mlp_network([8, 16, 1], "Tanh", in_dim=2)
    with pytest.raises(ValueError, match="drop the layout"):
        ConvBlockModel(ndims=1, arch="modified", layout="fa f",
                       features=[8, 1])
    with pytest.raises(ValueError, match="unknown arch"):
        ConvBlockModel(ndims=1, arch="resnet")


def test_taylor_taps_match_nested_jvp():
    init, apply, _ = make_modified_mlp_network([12, 12, 1], "Tanh",
                                               in_dim=2)
    params = init(jax.random.key(0))
    x = jax.random.uniform(jax.random.key(1), (8, 2))
    closure = [(0,), (1,), (0, 0), (0, 1), (1, 1), (0, 0, 0)]
    V, taps = apply.taylor_taps(params, x, closure)
    np.testing.assert_allclose(np.asarray(V), np.asarray(apply(params, x)),
                               rtol=1e-6)

    def e(a):
        return jnp.zeros_like(x).at[:, a].set(1.0)

    for mi in closure:
        fn = lambda z: apply(params, z)
        for k in mi:
            fn = (lambda f, kk: lambda z: jax.jvp(f, (z,), (e(kk),))[1])(
                fn, k)
        np.testing.assert_allclose(np.asarray(taps[mi]),
                                   np.asarray(fn(x)),
                                   rtol=2e-4, atol=1e-6)


def test_solver_plan_matches_fallback():
    def pde(f, x, t):
        return D(f, t) - 0.1 * D(D(f, x), x)

    solver = Solver(pde, ndims=2, seed=0, arch="modified",
                    initial_condition=lambda x: pdt.sin(np.pi * x),
                    features=[12, 12, 1], activation="Tanh")
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


def test_composes_with_embeddings():
    # periodic x + RFF on t + gated body: all three input transforms feed
    # one Taylor traversal.
    def pde(f, x, t):
        return D(f, t) - 0.1 * D(D(f, x), x)

    solver = Solver(pde, ndims=2, seed=0, arch="modified", periodic=(0,),
                    fourier_features=(4, 2.0),
                    initial_condition=lambda x: pdt.sin(2 * np.pi * x),
                    features=[12, 12, 1], activation="Tanh")
    assert solver._plan_ok
    solver.fit(niters=60, batch_size=128, progress=False)
    assert np.isfinite(solver.losses).all()
    # exact periodicity survives the gated body
    np.testing.assert_allclose(solver.predict(0.0, 0.4),
                               solver.predict(1.0, 0.4), rtol=1e-5,
                               atol=1e-6)


def test_ensemble_modified():
    # vmapped ensemble training composes with the gated body.
    def ode(f, x):
        return D(f, x) - 2 * np.pi * pdt.cos(2 * np.pi * x)

    solver = Solver(ode, ndims=1, seed=0, arch="modified", n_models=3,
                    features=[8, 8, 1], activation="Tanh",
                    initial_condition=0.5)
    solver.fit(niters=80, batch_size=128, progress=False)
    assert np.isfinite(solver.losses).all()
    xs = np.linspace(0, 1, 17)
    assert solver.predict_std(xs).shape == (17, 1)


def test_ode_converges_and_freeze():
    def ode(f, x):
        return D(f, x) - 2 * np.pi * pdt.cos(2 * np.pi * x)

    solver = Solver(ode, ndims=1, seed=0, arch="modified",
                    features=[16, 16, 1], activation="Tanh",
                    initial_condition=0.5)
    solver.fit(niters=600, batch_size=256, lr=0.01, progress=False)
    xs = np.linspace(0, 1, 100)
    err = np.max(np.abs(solver.predict(xs).ravel()
                        - (np.sin(2 * np.pi * xs) + 0.5)))
    assert err < 0.1, err
    # encoder layers freeze by name
    solver.model.freeze_layers(["fcu", "fcw"])
    before = np.asarray(solver.model.params["net"]["fcu"]["w"])
    solver.fit(niters=30, batch_size=256, progress=False)
    np.testing.assert_array_equal(
        np.asarray(solver.model.params["net"]["fcu"]["w"]), before)
    solver.model.unfreeze_trainable(layers=["fcu", "fcw"])


def test_deep_net_scan_matches_unrolled(monkeypatch):
    """Deep gated nets roll the equal-shape gate layers into lax.scan
    (compile-time O(1) in depth); the rolled traversal must stay
    numerically identical to the unrolled one — value, every Taylor tap,
    and the nested-jvp ground truth."""
    from pydens_tpu.models import layout as layout_mod

    x = jax.random.uniform(jax.random.key(1), (8, 2))
    closure = [(0,), (1,), (0, 0), (1, 1), (0, 0, 0)]

    # The scan/unrolled decision is fixed at network BUILD time (so a
    # built network can never desync from the Solver's step cache) —
    # each arm builds its own network; init is deterministic in the key,
    # so both arms share identical parameters.
    results = {}
    applies = {}
    params = None
    for label, min_layers in (("scan", 1), ("unrolled", 99)):
        monkeypatch.setattr(layout_mod, "_SCAN_MIN_LAYERS", min_layers)
        init, apply, _ = make_modified_mlp_network([10] * 6 + [1], "Tanh",
                                                   in_dim=2)
        params = init(jax.random.key(0))
        applies[label] = apply
        results[label] = (np.asarray(apply(params, x)),
                          apply.taylor_taps(params, x, closure))
    # default threshold (3) puts this 6-hidden-layer net on the scan path
    monkeypatch.undo()
    assert layout_mod._SCAN_MIN_LAYERS <= 5
    apply = applies["scan"]

    np.testing.assert_allclose(results["scan"][0], results["unrolled"][0],
                               rtol=1e-6, atol=1e-7)
    v_s, taps_s = results["scan"][1]
    v_u, taps_u = results["unrolled"][1]
    np.testing.assert_allclose(np.asarray(v_s), np.asarray(v_u),
                               rtol=1e-6, atol=1e-7)
    for mi in closure:
        np.testing.assert_allclose(np.asarray(taps_s[mi]),
                                   np.asarray(taps_u[mi]),
                                   rtol=1e-5, atol=1e-6, err_msg=str(mi))

    # ...and the scan-path taps against nested forward-mode ground truth
    def e(a):
        return jnp.zeros_like(x).at[:, a].set(1.0)

    for mi in [(0,), (0, 0), (0, 0, 0)]:
        fn = lambda z: apply(params, z)
        for k in mi:
            fn = (lambda f, kk: lambda z: jax.jvp(f, (z,), (e(kk),))[1])(
                fn, k)
        np.testing.assert_allclose(np.asarray(taps_s[mi]),
                                   np.asarray(fn(x)),
                                   rtol=2e-4, atol=1e-6, err_msg=str(mi))


def test_deep_net_solver_trains_on_scan_path():
    """End-to-end: a 5-hidden-layer modified net (scan path by default)
    trains through the compiled loop and converges on the tutorial ODE."""
    def ode(f, x):
        return D(f, x) - 2 * np.pi * pdt.cos(2 * np.pi * x)

    solver = Solver(ode, ndims=1, seed=0, arch="modified",
                    features=[12] * 5 + [1], activation="Tanh",
                    initial_condition=0.5)
    solver.fit(niters=500, batch_size=256, lr=0.01, progress=False)
    xs = np.linspace(0, 1, 100)
    err = np.max(np.abs(solver.predict(xs).ravel()
                        - (np.sin(2 * np.pi * xs) + 0.5)))
    assert err < 0.15, err
