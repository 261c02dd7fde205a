"""Dtype policy tests (SURVEY §7.6: bf16/f32 study — loss parity gates the
dtype choice).

Finding (documented in README): the whole pipeline runs in bfloat16, but
residual training drives *second derivatives* through the network and bf16's
8-bit mantissa costs roughly an order of magnitude in final solution error
(measured: max-err 0.0036 f32 vs 0.046 bf16 on the tutorial ODE).  float32
therefore stays the default; bf16 remains available for scale.
"""

import jax.numpy as jnp
import numpy as np

import pydens_tpu as pdt
from pydens_tpu import Solver, D


def _ode(f, x):
    return D(f, x) - 2 * np.pi * pdt.cos(2 * np.pi * x)


def test_bfloat16_end_to_end():
    solver = Solver(_ode, ndims=1, initial_condition=.5, activation="Tanh",
                    layout="fafaf", features=[12, 10, 1], seed=0,
                    dtype=jnp.bfloat16)
    solver.fit(niters=400, batch_size=400, lr=0.02, progress=False)
    assert solver.params["net"]["fc1"]["w"].dtype == jnp.bfloat16
    xs = np.linspace(0, 1, 50)
    preds = np.asarray(solver.predict(xs), np.float32).ravel()
    err = np.max(np.abs(preds - (np.sin(2 * np.pi * xs) + .5)))
    assert err < 0.2  # coarse: bf16 mantissa limits second-derivative fits


def test_float32_much_tighter_than_bf16():
    def run(dtype):
        s = Solver(_ode, ndims=1, initial_condition=.5, activation="Tanh",
                   layout="fafaf", features=[12, 10, 1], seed=0, dtype=dtype)
        s.fit(niters=400, batch_size=400, lr=0.02, progress=False)
        xs = np.linspace(0, 1, 50)
        p = np.asarray(s.predict(xs), np.float32).ravel()
        return np.max(np.abs(p - (np.sin(2 * np.pi * xs) + .5)))

    assert run(jnp.float32) * 3 < run(jnp.bfloat16)
