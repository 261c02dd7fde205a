"""Custom architectures: subclass `Model` with two pure functions
(`network_init`, `network_apply`) — the rebuild's equivalent of subclassing
the reference's `TorchModel` (examples notebook cell 5)."""

import numpy as np
import jax
import jax.numpy as jnp

import pydens_tpu as pdt
from pydens_tpu import Model, Solver, D


class ResidualMLP(Model):
    """Three hidden tanh layers with a residual connection."""

    WIDTH = 24

    def network_init(self, key):
        keys = jax.random.split(key, 4)
        w = self.WIDTH

        def dense(k, din, dout):
            bound = 1.0 / np.sqrt(din)
            kw, kb = jax.random.split(k)
            return {"w": jax.random.uniform(kw, (din, dout), jnp.float32,
                                            -bound, bound),
                    "b": jax.random.uniform(kb, (dout,), jnp.float32,
                                            -bound, bound)}

        return {"fc1": dense(keys[0], self.total, w),
                "fc2": dense(keys[1], w, w),
                "fc3": dense(keys[2], w, w),
                "fc4": dense(keys[3], w, 1)}

    def network_apply(self, net, xs):
        h = jnp.tanh(xs @ net["fc1"]["w"] + net["fc1"]["b"])
        skip = h
        h = jnp.tanh(h @ net["fc2"]["w"] + net["fc2"]["b"])
        h = jnp.tanh(h @ net["fc3"]["w"] + net["fc3"]["b"] + skip)
        return h @ net["fc4"]["w"] + net["fc4"]["b"]


def ode(f, x):
    return D(f, x) - 2 * np.pi * pdt.cos(2 * np.pi * x)


def main():
    solver = Solver(ode, ndims=1, initial_condition=.5, model=ResidualMLP,
                    seed=0)
    solver.fit(niters=600, batch_size=400, lr=0.01)
    xs = np.linspace(0, 1, 100)
    err = np.max(np.abs(solver.predict(xs).ravel()
                        - (np.sin(2 * np.pi * xs) + .5)))
    print(f"custom-model max error: {err:.4f}")
    # freeze works on custom layer names too
    solver.model.freeze_trainable(layers=["fc1"])
    solver.fit(niters=50, batch_size=400, lr=0.01)
    assert err < 0.05
    return solver


if __name__ == "__main__":
    main()
