"""Layer-wise adaptive activations (L-LAAF, Jagtap/Kawaguchi/Karniadakis,
arXiv 1909.12228): ``adaptive_activation=n`` gives every activation slot a
trainable slope applied as ``sigma(n * a_i * h)``, ``a_i`` init ``1/n``.
No reference counterpart (superset; the reference's activations are fixed —
model_torch.py:142-156).  Pins: init-equivalence to the plain net, Taylor-
plan exactness through the slope pre-scale, end-to-end training with
freeze-by-name, and the validation surface."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pydens_tpu as pdt
from pydens_tpu import D, Solver
from pydens_tpu.models.layout import make_layout_network


def _nested_jvp_tap(fn, x, mi):
    for k in mi:
        fn = (lambda g, kk: lambda z: jax.jvp(
            g, (z,), (jnp.zeros_like(z).at[:, kk].set(1.0),))[1])(fn, kk=k)
    return fn(x)


def test_laaf_init_equals_plain_net_and_slope_math():
    init_p, apply_p, names_p = make_layout_network(
        "fa fa f", [8, 8, 1], "Tanh", in_dim=2)
    init_a, apply_a, names_a = make_layout_network(
        "fa fa f", [8, 8, 1], "Tanh", in_dim=2, adaptive_activation=10.0)
    assert names_a == names_p + ["aa1", "aa2"]
    params = init_a(jax.random.key(0))
    np.testing.assert_allclose(np.asarray(params["aa1"]["a"]), 0.1)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(5, 2)), jnp.float32)
    # n*a == 1 at init: identical to the plain net (same dense draws).
    plain = {k: v for k, v in params.items() if not k.startswith("aa")}
    np.testing.assert_allclose(np.asarray(apply_a(params, x)),
                               np.asarray(apply_p(plain, x)), rtol=1e-6)
    # Moving a slope changes the math exactly as sigma(n*a*h).
    params2 = dict(params)
    params2["aa1"] = {"a": jnp.asarray([0.23], jnp.float32)}
    h = x @ params["fc1"]["w"] + params["fc1"]["b"]
    h = jnp.tanh(10.0 * 0.23 * h)
    h = jnp.tanh(h @ params["fc2"]["w"] + params["fc2"]["b"])
    expect = h @ params["fc3"]["w"] + params["fc3"]["b"]
    np.testing.assert_allclose(np.asarray(apply_a(params2, x)),
                               np.asarray(expect), rtol=1e-5)


@pytest.mark.parametrize("layout,branches", [
    ("fa fa f", None),
    ("fa B f . f", [dict(layout="R f .", features=[4])]),
])
def test_laaf_taylor_taps_match_nested_jvp(layout, branches):
    feats = {"fa fa f": [8, 8, 1], "fa B f . f": [6, 1, 1]}[layout]
    init, apply, _ = make_layout_network(
        layout, feats, "Tanh", in_dim=2, branches=branches,
        adaptive_activation=8.0)
    assert apply.taylor_ok and apply.adaptive
    params = init(jax.random.key(3))
    # Perturb the slopes off init so the test covers n*a != 1.
    for nm in list(params):
        if nm.split("_")[-1].startswith("aa"):
            params[nm] = {"a": params[nm]["a"] * 1.7}
    x = jnp.asarray(np.random.default_rng(3).normal(size=(6, 2)), jnp.float32)
    closure = [(0,), (1,), (0, 0), (0, 1), (1, 1)]
    V, taps = apply.taylor_taps(params, x, closure)
    np.testing.assert_allclose(np.asarray(V), np.asarray(apply(params, x)),
                               rtol=1e-5, atol=1e-6)
    for mi in closure:
        ref = _nested_jvp_tap(lambda z: apply(params, z), x, mi)
        np.testing.assert_allclose(np.asarray(taps[mi]), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5, err_msg=str(mi))


def test_laaf_trains_end_to_end_with_plan_and_freeze():
    # Tutorial ODE: f' = 2 pi cos(2 pi x), f(0) = 0.5.
    def ode(f, x):
        return D(f, x) - 2 * np.pi * pdt.cos(2 * np.pi * x)

    s = Solver(ode, ndims=1, initial_condition=0.5, seed=0,
               layout="fa fa f", features=[16, 16, 1], activation="Tanh",
               adaptive_activation=5.0)
    assert s._plan_ok  # slope pre-scale keeps the Taylor plan on
    a0 = float(s.model.params["net"]["aa1"]["a"][0])
    s.fit(niters=800, batch_size=64, lr=5e-3, progress=False)
    xs = np.linspace(0, 1, 50)
    err = np.max(np.abs(s.predict(xs).ravel()
                        - (np.sin(2 * np.pi * xs) + 0.5)))
    assert err < 0.06, err
    # The slopes actually trained (they carry gradient).
    assert float(s.model.params["net"]["aa1"]["a"][0]) != a0

    # Slopes are freeze-addressable by name.
    s.model.freeze_layers(["aa1"])
    mask = s.model.trainable_mask(s.model.params)
    assert not any(jax.tree.leaves(mask["net"]["aa1"]))
    assert all(jax.tree.leaves(mask["net"]["fc1"]))


def test_laaf_composes_with_separable():
    from pydens_tpu import SeparableModel

    def poisson(f, x, y):
        return D(D(f, x), x) + D(D(f, y), y) - 1.0

    s = Solver(poisson, ndims=2, boundary_condition=0, seed=0,
               model=SeparableModel, layout="fa f", features=[16, 8],
               adaptive_activation=5.0)
    s.fit(niters=40, batch_size=16, lr=5e-3, progress=False)
    assert np.isfinite(s.losses).all()


def test_laaf_validation():
    with pytest.raises(ValueError, match="positive scale"):
        make_layout_network("fa f", [4, 1], "Tanh", in_dim=1,
                            adaptive_activation=0.0)
    with pytest.raises(ValueError, match="modified"):
        Solver(lambda f, x: D(f, x), ndims=1, arch="modified",
               features=[8, 8, 1], adaptive_activation=5.0)
    # Zero 'a' slots anywhere = silent no-op: the model rejects it.
    with pytest.raises(ValueError, match="silent no-op"):
        Solver(lambda f, x: D(f, x), ndims=1, layout="f f",
               features=[8, 1], adaptive_activation=5.0)
    from pydens_tpu import SeparableModel
    with pytest.raises(ValueError, match="silent no-op"):
        Solver(lambda f, x, y: D(D(f, x), x) + D(D(f, y), y), ndims=2,
               boundary_condition=0, model=SeparableModel, layout="f f",
               features=[8, 4], adaptive_activation=5.0)
    # An activation-free BRANCH inside an adaptive parent is legitimate:
    # the parent's slots carry slopes, apply.adaptive is True, no raise.
    init, apply, names = make_layout_network(
        "fa B f . f", [6, 1, 1], "Tanh", in_dim=2,
        branches=[dict(layout="R f .", features=[4])],
        adaptive_activation=5.0)
    assert apply.adaptive and "aa1" in names
    # A slope-free builder result reports adaptive=False (the fused-path
    # gates stay available); the reject happens at the model level.
    _, apply2, _ = make_layout_network("f", [1], "Tanh", in_dim=1,
                                       adaptive_activation=5.0)
    assert not apply2.adaptive
