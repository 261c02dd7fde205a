"""Serving a trained solution from a bare process — the deployment unit.

``Solver.export()`` produces a self-contained StableHLO artifact: network
parameters and V-variables baked in, batch dimension shape-polymorphic,
lowered for CPU/TPU/GPU alike.  The serving side needs JAX only — not
pydens_tpu, not the Python equation, not the training machinery.  This
example closes the loop end-to-end:

1. train a 2D Poisson solver (the reference's README workload),
2. export the field to bytes,
3. serve it over HTTP from a stdlib ``http.server`` in a separate process
   whose namespace never imports the framework,
4. query the server and check the answers against ``solver.predict``.

No reference counterpart (the reference has no persistence or serving
story at all, SURVEY §5).
"""

import json
import os
import subprocess
import sys
import tempfile
import time
import urllib.request

import numpy as np

# The server process: deserializes the artifact with bare jax.export and
# answers POST /predict with {"xs": [[...], ...]} -> {"u": [[...], ...]}.
# Deliberately framework-free: the deployment unit is the artifact.
_SERVER = r"""
import json, sys
from http.server import BaseHTTPRequestHandler, HTTPServer
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from jax import export as jax_export

artifact_path, port = sys.argv[1], int(sys.argv[2])
with open(artifact_path, "rb") as fh:
    blob = fh.read()
MAGIC = b"PDTPUEXP1"                    # pydens_tpu export framing
assert blob.startswith(MAGIC)
exported = jax_export.deserialize(blob[len(MAGIC):])

class Handler(BaseHTTPRequestHandler):
    def do_POST(self):
        n = int(self.headers["Content-Length"])
        xs = jnp.asarray(json.loads(self.rfile.read(n))["xs"],
                         dtype=jnp.float32)
        u = exported.call(xs)           # shape-polymorphic: any batch size
        body = json.dumps({"u": [list(map(float, r)) for r in u]}).encode()
        self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):
        pass

srv = HTTPServer(("127.0.0.1", port), Handler)
print("READY", flush=True)
srv.serve_forever()
"""


def main():
    import pydens_tpu as pdt
    from pydens_tpu import Solver, D

    def pde(f, x, y):
        return D(D(f, x), x) + D(D(f, y), y) - 5 * pdt.sin(np.pi * (x + y))

    solver = Solver(pde, ndims=2, boundary_condition=1, layout="fa fa fa f",
                    activation="Tanh", units=[10, 12, 15, 1], seed=0)
    solver.fit(batch_size=100, niters=800, progress=False)

    tmp = tempfile.mkdtemp()
    artifact = os.path.join(tmp, "poisson.pdtx")
    solver.export(artifact)
    server_py = os.path.join(tmp, "server.py")
    with open(server_py, "w") as fh:
        fh.write(_SERVER)

    import random
    port = random.randint(20000, 40000)
    env = dict(os.environ)
    proc = subprocess.Popen([sys.executable, server_py, artifact, str(port)],
                            env=env, stdout=subprocess.PIPE, text=True)
    try:
        assert proc.stdout.readline().strip() == "READY"
        for n in (7, 33):               # two batch sizes: polymorphic serve
            xs = np.random.default_rng(n).uniform(0, 1, (n, 2))
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/predict",
                data=json.dumps({"xs": xs.tolist()}).encode(),
                headers={"Content-Type": "application/json"})
            t0 = time.perf_counter()
            with urllib.request.urlopen(req, timeout=60) as resp:
                served = np.asarray(json.loads(resp.read())["u"])
            dt = (time.perf_counter() - t0) * 1e3
            local = solver.predict(xs.astype(np.float32))
            err = np.max(np.abs(served - local))
            print(f"batch {n}: served == predict to {err:.2e} ({dt:.0f} ms)")
            assert served.shape == (n, 1)
            assert err < 1e-5, err
    finally:
        proc.kill()
    print("served artifact matches the training-side solution")
    return solver


if __name__ == "__main__":
    main()
