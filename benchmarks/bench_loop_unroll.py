"""Loop-structure probe for the compiled training loop: is XLA while-loop
bookkeeping a measurable share of the ~10 us/iteration headline step?

Three arms run the SAME real training body (the solver's own loss_fn on
the README Poisson config, flat-theta Adam, per-iteration fold_in
sampling — the body the production chunk runner executes):

  A. ``while_loop`` with a dynamic trip count, one body call per
     iteration — the production structure (dynamic ``niters`` = one
     compile per config).
  B. ``while_loop`` with the body manually unrolled 4x (dynamic trip
     n/4) — same dynamic-trip property, 4x fewer loop-bookkeeping steps.
  C. ``lax.scan`` with a STATIC length and ``unroll=8`` — the ceiling:
     what giving up the dynamic trip count (one compile per distinct
     ``niters``) would buy.

30k iterations per dispatch, 3 chained reps per arm (fresh theta per rep
— the tunnel memoizes identical dispatches), median reported.  Run:
``python benchmarks/bench_loop_unroll.py``.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

import pydens_tpu as pdt
from pydens_tpu import D, Solver
from pydens_tpu.solver import _unflatten

N = 30000
BATCH = 100


def build_step():
    def pde(f, x, y):
        return D(D(f, x), x) + D(D(f, y), y) - 5 * pdt.sin(np.pi * (x + y))

    s = Solver(pde, ndims=2, boundary_condition=1, layout="fa fa fa f",
               activation="Tanh", units=[10, 12, 15, 1], seed=0)
    mse = lambda a, b: jnp.mean((a - b) ** 2)
    loss_fn, _, _ = s._build_loss_fn((("equation", 1.0),), mse,
                                     use_plan=True)
    spec = s._flatten_spec()
    theta0 = s._flatten_jit(s.model.params)
    opt = optax.adam(5e-3)

    def step(i, theta, opt_state, key):
        pts = jax.random.uniform(jax.random.fold_in(key, i), (BATCH, 2))
        leaves = [pts[:, 0:1], pts[:, 1:2]]
        loss, g = jax.value_and_grad(
            lambda th: loss_fn(_unflatten(spec, th), leaves))(theta)
        up, opt_state = opt.update(g, opt_state, theta)
        return optax.apply_updates(theta, up), opt_state, loss

    return step, theta0, opt


def arm_while(step, unroll):
    def run(theta, opt_state, key, n):
        def cond(st):
            return st[0] < n

        def body(st):
            i, theta, opt_state, loss = st
            for j in range(unroll):
                theta, opt_state, loss = step(i + j, theta, opt_state, key)
            return (i + unroll, theta, opt_state, loss)

        _, theta, opt_state, loss = jax.lax.while_loop(
            cond, body, (jnp.int32(0), theta, opt_state,
                         jnp.asarray(0.0, jnp.float32)))
        return theta, loss

    return jax.jit(run, static_argnames=())


def arm_scan(step, unroll):
    def run(theta, opt_state, key, n):  # n ignored: static length
        def body(carry, i):
            theta, opt_state = carry
            theta, opt_state, loss = step(i, theta, opt_state, key)
            return (theta, opt_state), loss

        (theta, _), losses = jax.lax.scan(
            body, (theta, opt_state), jnp.arange(N, dtype=jnp.int32),
            unroll=unroll)
        return theta, losses[-1]

    return jax.jit(run)


def time_arm(name, run, theta0, opt):
    ts = []
    for rep in range(3):
        theta = theta0 + 1e-4 * rep  # fresh state: defeat tunnel memoization
        opt_state = opt.init(theta)
        key = jax.random.key(rep)
        out = run(theta, opt_state, key, jnp.int32(N))  # warm compile
        jax.block_until_ready(out)
        theta = theta0 + 1e-4 * (rep + 10)
        opt_state = opt.init(theta)
        t0 = time.perf_counter()
        out = run(theta, opt_state, key, jnp.int32(N))
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[1]
    print(json.dumps({"arm": name, "median_s": round(med, 4),
                      "iters_per_s": round(N / med, 1),
                      "final_loss": float(out[1])}))
    return N / med


def main():
    step, theta0, opt = build_step()
    base = time_arm("while_dyn_x1", arm_while(step, 1), theta0, opt)
    x4 = time_arm("while_dyn_x4", arm_while(step, 4), theta0, opt)
    sc = time_arm("scan_static_unroll8", arm_scan(step, 8), theta0, opt)
    print(f"| arm | it/s | vs while_x1 |")
    print(f"|---|---|---|")
    for nm, v in (("while_dyn_x1", base), ("while_dyn_x4", x4),
                  ("scan_static_unroll8", sc)):
        print(f"| {nm} | {v:,.0f} | {v / base:.2f}x |")


if __name__ == "__main__":
    main()
