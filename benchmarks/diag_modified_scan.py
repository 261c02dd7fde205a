"""A/B the modified-MLP gate-layer lax.scan roll (layout._SCAN_MIN_LAYERS)
on the Burgers flagship's two training configs: XLA compile seconds and
warm wall for unrolled vs scanned gate layers.  Run on the real TPU."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _COMPILE_SECONDS as COMPILE  # noqa: E402
from bench import _install_compile_listener as install_listener  # noqa: E402


def main():
    install_listener()
    import pydens_tpu as pdt
    from pydens_tpu import Solver, D, NumpySampler as NS
    from pydens_tpu.models import layout as layout_mod

    NU = 0.01 / np.pi

    def burgers(f, x, t):
        return D(f, t) + f * D(f, x) - NU * D(D(f, x), x)

    sampler = (NS("u", low=-1, high=1, seed=0)
               & NS("u", low=0, high=1, seed=1))

    def run(arm, min_layers):
        layout_mod._SCAN_MIN_LAYERS = min_layers
        solver = Solver(burgers, ndims=2, seed=0,
                        domain=[(-1.0, 1.0), (0.0, 1.0)],
                        initial_condition=lambda x: -pdt.sin(np.pi * x),
                        boundary_condition=0, arch="modified",
                        features=[20] * 8 + [1], activation="Tanh")

        def timed(tag, **kw):
            c0, t0 = COMPILE["total"], time.perf_counter()
            solver.fit(sampler=sampler, progress=False, **kw)
            wall = time.perf_counter() - t0
            print(f"{arm} {tag}: wall={wall:.1f}s "
                  f"compile={COMPILE['total'] - c0:.1f}s", flush=True)

        timed("adaptive-cold", niters=6000, batch_size=2048, lr=2e-3,
              adaptive=8)
        timed("lbfgs-cold", niters=1000, batch_size=10000,
              optimizer="LBFGS", resample=False)
        solver.reset(seed=0)
        timed("adaptive-warm", niters=6000, batch_size=2048, lr=2e-3,
              adaptive=8)
        timed("lbfgs-warm", niters=1000, batch_size=10000,
              optimizer="LBFGS", resample=False)
        xs = np.linspace(-1, 1, 401)
        pred = solver.predict(xs, np.full_like(xs, 1.0)).ravel()
        print(f"{arm} predict[t=1] mean|u| = {np.mean(np.abs(pred)):.4f}",
              flush=True)

    run("unrolled", 99)
    run("scan", 3)


if __name__ == "__main__":
    main()
