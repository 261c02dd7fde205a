"""Inference-path benchmark: XLA layer-by-layer vs the fused Pallas chain
on a dense evaluation grid (large batch).  Run on TPU:

    python benchmarks/bench_predict.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from pydens_tpu.models.layout import make_layout_network
from pydens_tpu.ops.pallas_mlp import make_fused_mlp_forward


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, out


def main():
    layout, features, in_dim = "fa fa fa f", [64, 64, 64, 1], 4
    init, apply, names = make_layout_network(layout, features, "Tanh",
                                             in_dim=in_dim)
    params = init(jax.random.key(0))
    fused = make_fused_mlp_forward(layout, apply.activations, names)

    print(f"net: {layout} {features}, in_dim={in_dim}, "
          f"backend={jax.devices()[0].platform}")
    for batch in (1 << 16, 1 << 18, 1 << 20, 1 << 22):
        x = jax.random.normal(jax.random.key(1), (batch, in_dim))
        xla_fn = jax.jit(apply)
        fused_fn = jax.jit(fused)
        t_xla, out_a = timeit(xla_fn, params, x)
        t_fused, out_b = timeit(fused_fn, params, x)
        err = float(jnp.max(jnp.abs(out_a - out_b)))
        print(f"batch {batch:>8}: xla {t_xla*1e3:7.2f} ms   "
              f"pallas {t_fused*1e3:7.2f} ms   "
              f"speedup {t_xla/t_fused:4.2f}x   maxdiff {err:.2e}")


if __name__ == "__main__":
    main()
