"""Checkpoint / resume.

The reference has no persistence at all (SURVEY §5: ``dill`` is declared but
never imported; resume-ish behavior is only ``fit(optimizer=None)``).  This is
a cheap, worthwhile superset: the parameter pytree (network + ``log_scale`` +
V variables), optimizer state, loss history and the step counter serialize via
``flax.serialization`` msgpack.
"""

import numpy as np
import jax
import jax.numpy as jnp
from flax import serialization

__all__ = ["save_solver", "load_solver"]

_MAGIC = b"PDTPU001"


def save_solver(solver, path):
    state = {
        "params": serialization.to_state_dict(
            jax.tree.map(np.asarray, solver.model.params)),
        "losses": np.asarray(solver.losses, np.float32),
        "step_counter": np.int64(solver._step_counter),
    }
    if solver._opt_state is not None:
        state["opt_state"] = serialization.to_state_dict(
            jax.tree.map(np.asarray, solver._opt_state))
    payload = serialization.msgpack_serialize(state)
    with open(path, "wb") as fh:
        fh.write(_MAGIC)
        fh.write(payload)


def load_solver(solver, path):
    with open(path, "rb") as fh:
        blob = fh.read()
    if not blob.startswith(_MAGIC):
        raise ValueError(f"{path} is not a pydens_tpu checkpoint")
    state = serialization.msgpack_restore(blob[len(_MAGIC):])

    current = solver.model.params
    try:
        restored = serialization.from_state_dict(current, state["params"])
        restored = jax.tree.map(jnp.asarray, restored)
        jax.tree.map(lambda a, b: _check_shape(a, b), current, restored)
    except (ValueError, KeyError) as err:
        raise ValueError(
            f"checkpoint at {path} does not match this solver's model "
            f"configuration: {err}") from None
    solver.model.params = restored
    solver.losses = list(np.asarray(state["losses"], np.float32))
    solver._step_counter = int(state["step_counter"])
    if "opt_state" in state and solver._opt_state is not None:
        try:
            solver._opt_state = serialization.from_state_dict(
                solver._opt_state, state["opt_state"])
        except Exception:  # optimizer config changed — state is best-effort
            import warnings
            warnings.warn("checkpoint optimizer state is incompatible with "
                          "the current optimizer and was not restored")


def _check_shape(a, b):
    if jnp.shape(a) != jnp.shape(b):
        raise ValueError(f"shape mismatch {jnp.shape(a)} vs {jnp.shape(b)}")
    return b
