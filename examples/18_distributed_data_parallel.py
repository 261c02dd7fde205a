"""Multi-process (multi-host) data-parallel training.

The training step is pure SPMD, so scaling past one process is three
lines of setup, not a different API: every process joins the cluster,
builds the SAME solver over the global mesh, and drives it in lockstep.
On a TPU pod each host runs this script (JAX auto-detects the topology —
``initialize()`` needs no arguments); this demo self-spawns two CPU
processes with 4 virtual devices each so it runs anywhere.

What the framework does under the hood (``pydens_tpu/parallel/
distributed.py``): per-process host state (parameters, optimizer
moments) is assembled into replicated global arrays; host-sampled
batches become sharded global arrays via ``make_array_from_callback``;
device-side sampling needs nothing — the same seed yields the same batch
everywhere and the sharding constraint splits it.  Losses are replicated
outputs, readable on every process.

No reference counterpart (the reference is single-process CPU,
SURVEY §2); the equivalence proof lives in ``tests/test_distributed.py``
(2-process loss trajectory == single-process run).
"""

import json
import os
import random
import subprocess
import sys
import tempfile

import numpy as np

NITERS, BATCH = 200, 64


def worker(process_id, port, out_path):
    """One training process — on a real pod, this function body (minus the
    explicit coordinator arguments) IS the whole program."""
    import jax
    jax.config.update("jax_platforms", "cpu")       # demo: CPU backend
    jax.config.update("jax_num_cpu_devices", 4)     # demo: 4 devices/process

    from pydens_tpu.parallel import distributed, make_mesh
    distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=2, process_id=process_id)
    # On a TPU pod: distributed.initialize()  — everything auto-detected.

    import pydens_tpu as pdt
    from pydens_tpu import Solver, D

    def ode(f, x):
        return D(f, x) - 2 * np.pi * pdt.cos(2 * np.pi * x)

    mesh = make_mesh()  # spans ALL 8 devices across both processes
    solver = Solver(ode, ndims=1, initial_condition=.5, mesh=mesh, seed=0,
                    activation="Tanh", layout="fafaf", features=[12, 10, 1])
    solver.fit(niters=NITERS, batch_size=BATCH, lr=0.02, progress=False)

    # Replicated outputs are readable everywhere; params fetch to host
    # numpy for single-process serving handoff.
    xs = np.linspace(0, 1, 50)
    err = float(np.max(np.abs(solver.predict(xs).ravel()
                              - (np.sin(2 * np.pi * xs) + .5))))
    if process_id == 0:
        with open(out_path, "w") as fh:
            json.dump({"final_loss": float(solver.losses[-1]), "err": err},
                      fh)


def main():
    port = random.randint(20000, 40000)
    out = os.path.join(tempfile.mkdtemp(), "result.json")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # the demo sets its own device count
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + (
        ":" + env["PYTHONPATH"] if env.get("PYTHONPATH") else "")
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__),
         "--worker", str(pid), str(port), out], env=env)
        for pid in (0, 1)]
    for p in procs:
        assert p.wait(timeout=420) == 0, "distributed worker failed"
    result = json.load(open(out))
    print(f"2-process distributed fit: final loss {result['final_loss']:.5f}"
          f", max |u - sin(2pi x) - 1/2| = {result['err']:.4f}")
    assert result["final_loss"] < 5e-2, result
    assert result["err"] < 0.15, result
    return result


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), sys.argv[3], sys.argv[4])
    else:
        main()
