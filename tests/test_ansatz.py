"""Tests for the condition-binding ansatz (port of
/root/reference/pydens/model_torch.py:107-128): conditions must hold by
construction, not approximately."""

import jax
import jax.numpy as jnp
import numpy as np

from pydens_tpu.models import ConvBlockModel


def make_model(**kwargs):
    model = ConvBlockModel(**kwargs)
    model.params = model.init_params(jax.random.key(0))
    return model


def test_boundary_condition_exact_on_all_edges():
    model = make_model(ndims=2, boundary_condition=1.0)
    edge = np.linspace(0, 1, 13, dtype=np.float32).reshape(-1, 1)
    for fixed in (0.0, 1.0):
        for col in (0, 1):
            pts = np.hstack([edge, np.full_like(edge, fixed)])
            if col == 1:
                pts = pts[:, ::-1]
            out = model.apply(model.params, jnp.asarray(pts))
            np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-6)


def test_boundary_condition_respects_domain():
    model = make_model(ndims=1, boundary_condition=2.5, domain=(-1, 3))
    for endpoint in (-1.0, 3.0):
        out = model.apply(model.params,
                          jnp.asarray([[endpoint]], jnp.float32))
        np.testing.assert_allclose(np.asarray(out), 2.5, atol=1e-6)


def test_initial_condition_exact_at_t0():
    # 1D + time: ndims=2, ic over the single spatial dim.
    ic = lambda x: jnp.sin(np.pi * x)
    model = make_model(ndims=2, initial_condition=ic, boundary_condition=0.0)
    xs = np.linspace(0, 1, 9, dtype=np.float32).reshape(-1, 1)
    pts = np.hstack([xs, np.zeros_like(xs)])  # t = t0 = 0
    out = model.apply(model.params, jnp.asarray(pts))
    np.testing.assert_allclose(np.asarray(out).ravel(),
                               np.sin(np.pi * xs.ravel()), atol=1e-6)


def test_constant_initial_condition_wrapped():
    model = make_model(ndims=1, initial_condition=0.5)
    # ndims=1 with IC: no spatial dims; at t=t0 output must equal 0.5.
    out = model.apply(model.params, jnp.zeros((4, 1)))
    np.testing.assert_allclose(np.asarray(out), 0.5, atol=1e-6)


def test_initial_condition_t0_from_domain():
    model = make_model(ndims=1, initial_condition=1.25, domain=(2.0, 5.0))
    out = model.apply(model.params, jnp.full((3, 1), 2.0))
    np.testing.assert_allclose(np.asarray(out), 1.25, atol=1e-6)


def test_param_columns_skip_ansatz():
    # nparams=1: the parameter column feeds the net but not the ansatz
    # products — boundary must still bind regardless of the param value.
    model = make_model(ndims=2, nparams=1, boundary_condition=3.0)
    for p in (0.0, 0.7, 5.0):
        pts = jnp.asarray([[0.0, 0.5, p], [1.0, 0.2, p]], jnp.float32)
        out = model.apply(model.params, pts)
        np.testing.assert_allclose(np.asarray(out), 3.0, atol=1e-5)


def test_log_scale_controls_gate_sharpness():
    model = make_model(ndims=1, initial_condition=0.0)
    params_soft = jax.tree.map(lambda x: x, model.params)
    params_sharp = dict(params_soft, log_scale=jnp.asarray(-3.0))
    t = jnp.full((1, 1), 0.05)
    out_soft = np.asarray(model.apply(params_soft, t))
    out_sharp = np.asarray(model.apply(params_sharp, t))
    # Sharper gate -> the sigmoid saturates faster -> larger |gate| weight
    # on the raw network output away from t0.
    gate_soft = jax.nn.sigmoid(0.05 / np.exp(0.0)) - 0.5
    gate_sharp = jax.nn.sigmoid(0.05 / np.exp(-3.0)) - 0.5
    assert gate_sharp > gate_soft
    # outputs must differ (gate actually applied)
    assert abs(out_sharp - out_soft).max() > 0


def test_domain_validation_errors():
    import pytest
    with pytest.raises(ValueError, match="1d or 2d-sequence"):
        make_model(ndims=1, domain="bad")
    with pytest.raises(ValueError, match="1d or 2d-sequence"):
        make_model(ndims=1, domain=["bad"])
    with pytest.raises(ValueError, match="pairs"):
        make_model(ndims=2, domain=[(0, 1)])
