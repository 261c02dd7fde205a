"""Unit tests for the layout-string network builder (batchflow Block
equivalent; grammar per /root/reference/pydens/model_torch.py:142-156)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pydens_tpu.models.layout import (make_layout_network, parse_layout,
                                      resolve_activation)


def test_parse_layout_strips_spaces():
    assert parse_layout("fa fa fa f") == list("fafafaf")


def test_parse_layout_rejects_unknown_tokens():
    with pytest.raises(ValueError, match="unknown layout token"):
        parse_layout("fax")


def test_parse_layout_rejects_unbalanced_skips():
    with pytest.raises(ValueError, match="unmatched 'R'"):
        parse_layout("faR fa f")
    with pytest.raises(ValueError, match="no matching 'R'"):
        parse_layout("fa fa+ f")


def test_mlp_shapes():
    init, apply, names = make_layout_network(
        "fa fa f", [5, 7, 1], "Tanh", in_dim=3)
    params = init(jax.random.key(0))
    assert names == ["fc1", "fc2", "fc3"]
    assert params["fc1"]["w"].shape == (3, 5)
    assert params["fc2"]["w"].shape == (5, 7)
    assert params["fc3"]["w"].shape == (7, 1)
    out = apply(params, jnp.ones((11, 3)))
    assert out.shape == (11, 1)


def test_feature_count_mismatch():
    with pytest.raises(ValueError, match="dense layers"):
        make_layout_network("fa fa f", [5, 1], "Tanh", in_dim=2)


def test_skip_connection_sums():
    # 'faR fa+ f': skip over the middle layer; widths must match (5 == 5).
    init, apply, _ = make_layout_network(
        "faR fa+ f", [5, 5, 1], "identity", in_dim=2)
    params = init(jax.random.key(1))
    x = jnp.ones((4, 2))
    # Manually: h1 = x@w1+b1 ; h2 = h1@w2+b2 + h1 ; out = h2@w3+b3
    h1 = x @ params["fc1"]["w"] + params["fc1"]["b"]
    h2 = h1 @ params["fc2"]["w"] + params["fc2"]["b"] + h1
    expect = h2 @ params["fc3"]["w"] + params["fc3"]["b"]
    np.testing.assert_allclose(apply(params, x), expect, rtol=1e-5)


def test_skip_width_mismatch_raises():
    with pytest.raises(ValueError, match="skip connection"):
        make_layout_network("faR fa+ f", [5, 6, 1], "Tanh", in_dim=2)


def test_activation_specs():
    assert resolve_activation("Tanh")(jnp.array(0.5)) == jnp.tanh(0.5)
    assert resolve_activation("sin") is jnp.sin
    # callable passes through
    fn = lambda x: x * 2
    assert resolve_activation(fn) is fn
    with pytest.raises(ValueError, match="unknown activation"):
        resolve_activation("nope")


def test_activation_sequence_matched_to_slots():
    init, apply, _ = make_layout_network(
        "fa fa f", [4, 4, 1], ["sin", "Tanh"], in_dim=2)
    params = init(jax.random.key(0))
    x = jnp.ones((3, 2))
    h1 = jnp.sin(x @ params["fc1"]["w"] + params["fc1"]["b"])
    h2 = jnp.tanh(h1 @ params["fc2"]["w"] + params["fc2"]["b"])
    expect = h2 @ params["fc3"]["w"] + params["fc3"]["b"]
    np.testing.assert_allclose(apply(params, x), expect, rtol=1e-5)


def test_activation_sequence_wrong_length():
    with pytest.raises(ValueError, match="activation slots"):
        make_layout_network("fa fa f", [4, 4, 1], ["sin"] * 3, in_dim=2)


def test_torch_class_activation_resolves_by_name():
    # Migrated code may pass torch nn classes; resolve by class name.
    class Sigmoid:  # stand-in for torch.nn.Sigmoid
        pass

    act = resolve_activation(Sigmoid)
    np.testing.assert_allclose(act(jnp.array(0.0)), 0.5)


def test_conv_token_degenerates_to_dense():
    init, apply, _ = make_layout_network("ca f", [4, 1], "Tanh", in_dim=2)
    params = init(jax.random.key(0))
    assert params["fc1"]["w"].shape == (2, 4)
    assert apply(params, jnp.ones((5, 2))).shape == (5, 1)


def test_init_matches_torch_linear_scale():
    init, _, _ = make_layout_network("f", [64], "Tanh", in_dim=16)
    params = init(jax.random.key(0))
    bound = 1.0 / np.sqrt(16)
    w = np.asarray(params["fc1"]["w"])
    assert w.min() >= -bound and w.max() <= bound
    # not degenerate
    assert w.std() > bound / 4


# -- branch/join/norm superset tokens (B, '.', '*', 'n') --------------------

def _nested_jvp_tap(fn, x, mi):
    """Reference tap: nested jvp along one-hot coordinate directions."""
    for k in mi:
        fn = (lambda g, kk: lambda z: jax.jvp(
            g, (z,), (jnp.zeros_like(z).at[:, kk].set(1.0),))[1])(fn, kk=k)
    return fn(x)


def test_parse_layout_accepts_superset_tokens():
    assert parse_layout("fa B f .") == list("faBf.")
    assert parse_layout("fa B fa * f") == list("faBfa*f")
    assert parse_layout("fan fa f") == list("fanfaf")


def test_join_without_branch_start_raises():
    with pytest.raises(ValueError, match="no matching 'R'"):
        parse_layout("fa fa. f")
    with pytest.raises(ValueError, match="no matching 'R'"):
        parse_layout("fa fa* f")


def test_concat_join_appends_branch_features():
    # identity branch: output = [main(h), h] along the feature axis.
    init, apply, _ = make_layout_network(
        "fa B f .", [5, 2], "Tanh", in_dim=3)
    params = init(jax.random.key(0))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 3)), jnp.float32)
    h = jnp.tanh(x @ params["fc1"]["w"] + params["fc1"]["b"])
    main = h @ params["fc2"]["w"] + params["fc2"]["b"]
    expect = jnp.concatenate([main, h], axis=-1)
    out = apply(params, x)
    assert out.shape == (4, 7)
    np.testing.assert_allclose(out, expect, rtol=1e-5)


def test_product_join_math_and_width_validation():
    init, apply, _ = make_layout_network(
        "fa B fa * f", [6, 6, 1], "Tanh", in_dim=2)
    params = init(jax.random.key(1))
    x = jnp.asarray(np.random.default_rng(1).normal(size=(4, 2)), jnp.float32)
    h = jnp.tanh(x @ params["fc1"]["w"] + params["fc1"]["b"])
    g = jnp.tanh(h @ params["fc2"]["w"] + params["fc2"]["b"])
    expect = (g * h) @ params["fc3"]["w"] + params["fc3"]["b"]
    np.testing.assert_allclose(apply(params, x), expect, rtol=1e-5)
    with pytest.raises(ValueError, match="product join"):
        make_layout_network("fa B fa * f", [6, 5, 1], "Tanh", in_dim=2)


def test_branch_subnetwork_multihead():
    # Two dense heads off a shared trunk: main 1-col head + branch 2-col
    # head, branch layers named br1_fc{i} (freeze_layers-addressable).
    init, apply, names = make_layout_network(
        "fa fa B f .", [8, 8, 1], "Tanh", in_dim=2,
        branches=[dict(layout="fa f", features=[4, 2])])
    assert names == ["fc1", "fc2", "fc3", "br1_fc1", "br1_fc2"]
    params = init(jax.random.key(0))
    assert params["br1_fc1"]["w"].shape == (8, 4)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(5, 2)), jnp.float32)
    h = jnp.tanh(x @ params["fc1"]["w"] + params["fc1"]["b"])
    h = jnp.tanh(h @ params["fc2"]["w"] + params["fc2"]["b"])
    main = h @ params["fc3"]["w"] + params["fc3"]["b"]
    b = jnp.tanh(h @ params["br1_fc1"]["w"] + params["br1_fc1"]["b"])
    branch = b @ params["br1_fc2"]["w"] + params["br1_fc2"]["b"]
    out = apply(params, x)
    assert out.shape == (5, 3)
    np.testing.assert_allclose(
        out, jnp.concatenate([main, branch], axis=-1), rtol=1e-5)


def test_branch_spec_validation():
    with pytest.raises(ValueError, match="branches= has"):
        make_layout_network("fa f", [4, 1], "Tanh", in_dim=2,
                            branches=[dict(layout="f", features=[1])])
    with pytest.raises(ValueError, match="needs 'layout' and 'features'"):
        make_layout_network("fa B f .", [4, 1], "Tanh", in_dim=2,
                            branches=[dict(features=[1])])
    with pytest.raises(ValueError, match="unknown branch spec key"):
        make_layout_network(
            "fa B f .", [4, 1], "Tanh", in_dim=2,
            branches=[dict(layout="f", features=[1], nope=3)])


def test_branch_output_width_is_its_true_width():
    """A branch whose own layout changes width after its last dense layer
    (e.g. a trailing '.' concat) must report its TRUE output width to the
    parent's symbolic pass — not ``features[-1]``, which under-sized the
    next dense layer's fan_in (runtime dot-shape crash) and mis-validated
    product joins (round-4 review fix)."""
    # Branch 'R f .' on width 6 outputs 4 + 6 = 10, not features[-1] = 4.
    init, apply, _ = make_layout_network(
        "fa B f . f", [6, 1, 1], "Tanh", in_dim=2,
        branches=[dict(layout="R f .", features=[4])])
    params = init(jax.random.key(7))
    assert params["fc3"]["w"].shape == (11, 1)  # 1 (main) + 10 (branch)
    x = jnp.asarray(np.random.default_rng(7).normal(size=(5, 2)), jnp.float32)
    h = jnp.tanh(x @ params["fc1"]["w"] + params["fc1"]["b"])
    br = jnp.concatenate(
        [h @ params["br1_fc1"]["w"] + params["br1_fc1"]["b"], h], axis=-1)
    main = h @ params["fc2"]["w"] + params["fc2"]["b"]
    expect = (jnp.concatenate([main, br], axis=-1) @ params["fc3"]["w"]
              + params["fc3"]["b"])
    out = apply(params, x)
    assert out.shape == (5, 1) and apply.out_dim == 1
    np.testing.assert_allclose(out, expect, rtol=1e-5)

    # The same true width makes a width-10 product join VALID (it was
    # rejected as "joins width 4 with width 10").
    init2, apply2, _ = make_layout_network(
        "fa B fa * f", [6, 10, 1], "Tanh", in_dim=2,
        branches=[dict(layout="R f .", features=[4])])
    out2 = apply2(init2(jax.random.key(8)), x)
    assert out2.shape == (5, 1) and np.isfinite(np.asarray(out2)).all()

    # A dense-free branch (features=[]) is a clean pure-join, not an
    # IndexError.
    init3, apply3, _ = make_layout_network(
        "fa B f . f", [6, 1, 1], "Tanh", in_dim=2,
        branches=[dict(layout="R .", features=[])])
    out3 = apply3(init3(jax.random.key(9)), x)
    assert out3.shape == (5, 1)


def test_layernorm_token_math_and_plan_gating():
    init, apply, names = make_layout_network(
        "fan fa f", [6, 6, 1], "Tanh", in_dim=2)
    assert "ln1" in names
    params = init(jax.random.key(2))
    x = jnp.asarray(np.random.default_rng(3).normal(size=(4, 2)), jnp.float32)
    h = jnp.tanh(x @ params["fc1"]["w"] + params["fc1"]["b"])
    mu = h.mean(-1, keepdims=True)
    var = ((h - mu) ** 2).mean(-1, keepdims=True)
    hn = (params["ln1"]["g"] * (h - mu) / jnp.sqrt(var + 1e-6)
          + params["ln1"]["b"])
    h2 = jnp.tanh(hn @ params["fc2"]["w"] + params["fc2"]["b"])
    expect = h2 @ params["fc3"]["w"] + params["fc3"]["b"]
    np.testing.assert_allclose(apply(params, x), expect, rtol=2e-5)
    # LayerNorm's Jacobian mixes features: the fast Taylor path must be OFF
    # (the nested-jvp fallback handles derivatives exactly).
    assert not apply.taylor_ok
    with pytest.raises(ValueError, match="LayerNorm"):
        apply.taylor_taps(params, x, [(0,)])


@pytest.mark.parametrize("layout,branches", [
    ("fa fa B f .", [dict(layout="fa f", features=[4, 2])]),
    ("fa B fa * f", None),
    ("faR fa + B f .", None),
    ("fa B f . f", [dict(layout="R f .", features=[4])]),
])
def test_superset_taylor_taps_match_nested_jvp(layout, branches):
    feats = {"fa fa B f .": [8, 8, 1], "fa B fa * f": [6, 6, 1],
             "faR fa + B f .": [6, 6, 1],
             "fa B f . f": [6, 1, 1]}[layout]
    init, apply, _ = make_layout_network(
        layout, feats, "Tanh", in_dim=2, branches=branches)
    assert apply.taylor_ok
    params = init(jax.random.key(4))
    x = jnp.asarray(np.random.default_rng(4).normal(size=(6, 2)), jnp.float32)
    closure = [(0,), (1,), (0, 0), (1, 1), (0, 1)]
    V, taps = apply.taylor_taps(params, x, closure)
    np.testing.assert_allclose(V, apply(params, x), rtol=1e-5, atol=1e-6)
    for mi in closure:
        ref = _nested_jvp_tap(lambda z: apply(params, z), x, mi)
        np.testing.assert_allclose(np.asarray(taps[mi]), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)


def test_branched_multihead_solves_system_end_to_end():
    """Two heads off a shared trunk solve u' = v, v' = -u (u=sin, v=cos):
    the 'B' branch flows through Solver discovery, the Taylor plan, the
    compiled loop, freeze-by-name, and predict."""
    from pydens_tpu import Solver, D

    def system(f, x):
        u, v = f[:, 0:1], f[:, 1:2]
        return (D(u, x) - v, D(v, x) + u)

    solver = Solver(system, ndims=1, seed=0, activation="Tanh",
                    layout="fa fa B f .", features=[16, 16, 1],
                    branches=[dict(layout="f", features=[1])],
                    initial_condition=np.array([0.0, 1.0]))
    assert solver._plan_ok  # the branch propagates Taylor taps
    solver.fit(niters=600, batch_size=64, lr=5e-3, progress=False)
    xs = np.linspace(0, 1, 33)
    pred = solver.predict(xs)
    np.testing.assert_allclose(pred[:, 0], np.sin(xs), atol=0.05)
    np.testing.assert_allclose(pred[:, 1], np.cos(xs), atol=0.05)

    # Branch layers are freeze-addressable by their br{i}_ name.
    solver.model.freeze_layers(["br1_fc1"])
    mask = solver.model.trainable_mask(solver.model.params)
    assert not any(jax.tree.leaves(mask["net"]["br1_fc1"]))
    assert all(jax.tree.leaves(mask["net"]["fc1"]))


def test_layernorm_layout_trains_via_fallback():
    """'n' layouts train through the exact nested-jvp fallback (the fast
    Taylor path is off: LayerNorm's Jacobian is not diagonal)."""
    from pydens_tpu import Solver, D

    def ode(f, x):
        return D(f, x) + f

    solver = Solver(ode, ndims=1, seed=0, activation="Tanh",
                    layout="fan fa f", features=[12, 12, 1],
                    initial_condition=1.0)
    assert not solver._plan_ok
    solver.fit(niters=400, batch_size=64, lr=5e-3, progress=False)
    xs = np.linspace(0, 1, 17)
    np.testing.assert_allclose(solver.predict(xs)[:, 0], np.exp(-xs),
                               atol=0.05)
