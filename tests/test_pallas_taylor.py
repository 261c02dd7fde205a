"""Fused Pallas Taylor forward+backward kernel: values AND parameter
gradients must match the XLA Taylor-plan path exactly (same math, HIGHEST
dot precision).  Runs in interpret mode on the CPU backend; the Mosaic
lowering is exercised by benchmarks/bench_fused_taylor.py on TPU."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import pydens_tpu as pdt
from pydens_tpu import Solver, D


def _poisson_solver(**kw):
    def pde(f, x, y):
        return (D(D(f, x), x) + D(D(f, y), y)
                - 5 * pdt.sin(np.pi * (x + y)))

    return Solver(pde, ndims=2, boundary_condition=1, layout="fa fa f",
                  activation="Tanh", units=[16, 16, 1], seed=0, **kw)


def _loss_and_grad(solver, use_fused, monkeypatch, pts):
    if use_fused:
        monkeypatch.setenv("PYDENS_TPU_FUSED_TAYLOR", "always")
    else:
        monkeypatch.delenv("PYDENS_TPU_FUSED_TAYLOR", raising=False)
    solver.model._fused_taylor_cache = {}
    lt = (("equation", 1.0),)
    crit = lambda a, b: jnp.mean((a - b) ** 2)
    loss_fn, *_ = solver._build_loss_fn(lt, crit, use_plan=True)
    leaves = [pts[:, i:i + 1] for i in range(2)]
    return jax.value_and_grad(loss_fn)(solver.model.params, leaves)


@pytest.mark.parametrize("stacked", ["0", "1"])
def test_fused_taps_match_xla_plan(monkeypatch, stacked):
    # stacked="1" covers the retired row-stacked traversal (one matmul per
    # dense over n_streams*tile rows) — differential-correct, kept opt-in
    # because the Mosaic compile hangs at width >= 64 (BENCHMARKS.md
    # "Fused Pallas Taylor kernel: retired").
    monkeypatch.setenv("PYDENS_TPU_TAYLOR_STACKED", stacked)
    solver = _poisson_solver()
    pts = jax.random.uniform(jax.random.key(7), (96, 2)) * 0.8 + 0.1
    l_x, g_x = _loss_and_grad(solver, False, monkeypatch, pts)
    l_f, g_f = _loss_and_grad(solver, True, monkeypatch, pts)
    np.testing.assert_allclose(float(l_f), float(l_x), rtol=2e-5)
    for a, b in zip(jax.tree.leaves(g_f), jax.tree.leaves(g_x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-5)


def test_fused_training_converges(monkeypatch):
    monkeypatch.setenv("PYDENS_TPU_FUSED_TAYLOR", "always")
    solver = _poisson_solver()
    solver.fit(niters=300, batch_size=256, lr=0.02, fast_taps=True,
               progress=False)
    assert np.isfinite(solver.losses).all()
    assert solver.losses[-1] < solver.losses[0]


def test_fused_kernel_scope_guards():
    from pydens_tpu.ops.pallas_taylor import supports

    assert supports(["f", "a", "f"], [(0,), (0, 0)])
    assert not supports(["f", "a", "R", "f", "+"], [(0,)])   # skips
    assert not supports(["f", "a", "f"], [(0,), (0, 0), (0, 0, 0)])  # order 3
    assert not supports(["f", "a", "f"], [(0,)], periodic_dims=(0,))
