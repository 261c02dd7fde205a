"""Fused Pallas MLP forward: numerical equivalence with the XLA layout
network (interpreter mode — runs on the CPU test backend)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pydens_tpu.models.layout import make_layout_network
from pydens_tpu.ops.pallas_mlp import make_fused_mlp_forward


@pytest.mark.parametrize("layout,features", [
    ("fa fa f", [32, 32, 1]),
    ("fa fa fa f", [10, 12, 15, 1]),
    ("faR fa fa+ f", [16, 16, 16, 1]),
])
def test_fused_matches_xla(layout, features):
    init, apply, names = make_layout_network(layout, features, "Tanh",
                                             in_dim=3)
    params = init(jax.random.key(0))
    fused = make_fused_mlp_forward(layout, apply.activations, names,
                                   interpret=True)
    x = jax.random.normal(jax.random.key(1), (2000, 3))  # non-tile-multiple
    np.testing.assert_allclose(np.asarray(fused(params, x)),
                               np.asarray(apply(params, x)),
                               rtol=2e-5, atol=2e-5)


def test_fused_path_off_by_default():
    from pydens_tpu.models import ConvBlockModel
    model = ConvBlockModel(ndims=2, boundary_condition=0.0)
    assert not model._fusion_enabled(10 ** 9)


def test_env_override(monkeypatch):
    from pydens_tpu.models import ConvBlockModel
    model = ConvBlockModel(ndims=2)
    monkeypatch.setenv("PYDENS_TPU_FUSED", "always")
    assert model._fusion_enabled(1)


def test_predict_correct_with_fusion_forced(monkeypatch):
    """With fusion forced on the CPU backend, predict stays correct —
    either the kernel runs (pallas CPU lowering) or the fallback engages."""
    import pydens_tpu as pdt
    from pydens_tpu import Solver, D

    monkeypatch.setenv("PYDENS_TPU_FUSED", "always")
    solver = Solver(lambda f, x: D(f, x), ndims=1, boundary_condition=2.0,
                    seed=0)
    xs = np.linspace(0, 1, 257)
    out = solver.predict(xs)
    monkeypatch.setenv("PYDENS_TPU_FUSED", "never")
    solver.model._fused_broken = False
    ref = solver.predict(xs)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_predict_apply_fallback(monkeypatch):
    """If the fused path raises, predict_apply transparently falls back."""
    import pydens_tpu as pdt
    from pydens_tpu import Solver, D

    solver = Solver(lambda f, x: D(f, x), ndims=1, seed=0)
    model = solver.model
    monkeypatch.setenv("PYDENS_TPU_FUSED", "always")

    def boom(net, xs):
        raise RuntimeError("mosaic says no")

    monkeypatch.setattr(model, "network_apply_fused", boom)
    out = solver.predict(np.linspace(0, 1, 7))
    assert out.shape == (7, 1)
    assert model._fused_broken
