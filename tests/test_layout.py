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
