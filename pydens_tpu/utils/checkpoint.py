"""Checkpoint / resume.

The reference has no persistence at all (SURVEY §5: ``dill`` is declared but
never imported; resume-ish behavior is only ``fit(optimizer=None)``).  This is
a cheap, worthwhile superset: the parameter pytree (network + ``log_scale`` +
V variables), optimizer state, RNG key, loss history, fit-history records,
freeze state and the condition-interpretation cache serialize via
``flax.serialization`` msgpack — enough state that a resumed run reproduces
the continuation of the saving run bit-for-bit (``tests/test_checkpoint.py::
test_resume_reproduces_uninterrupted_continuation``).
"""

import json
import warnings

import numpy as np
import jax
import jax.numpy as jnp
from flax import serialization

__all__ = ["save_solver", "load_solver"]

_MAGIC = b"PDTPU002"
_MAGIC_V1 = b"PDTPU001"


def save_solver(solver, path, *, params=None, opt_state=None, losses=None,
                step_counter=None, balanced_weights=None):
    """Serialize the solver's training state.  The keyword overrides let
    ``fit`` snapshot mid-fit state (live carry buffers) without mutating
    the solver — used by ``fit(checkpoint_path=...)`` auto-checkpointing.
    ``balanced_weights`` (a list, when loss balancing is active) is stored
    so a resumed fit can reuse the learned term weights via
    ``loss_terms=dict(zip(names, solver.last_balanced_weights))``."""
    params = solver.model.params if params is None else params
    losses = solver.losses if losses is None else losses
    step_counter = (solver._step_counter if step_counter is None
                    else step_counter)
    state = {
        "params": serialization.to_state_dict(
            jax.tree.map(np.asarray, params)),
        "losses": np.asarray(losses, np.float32),
        "step_counter": np.int64(step_counter),
        # Typed PRNG keys don't serialize directly; store the raw key data.
        "rng_key_data": np.asarray(jax.random.key_data(solver._key)),
        # Non-array training context, json-encoded: fit history records,
        # sticky condition-interpretation modes, freeze state.
        "meta": json.dumps({
            "history": solver.history,
            "cond_modes": solver.model._cond_modes,
            "frozen_layers": sorted(solver.model._frozen_layers),
            "frozen_variables": sorted(solver.model._frozen_variables),
            "balanced_weights": balanced_weights,
        }),
    }
    opt_state = solver._opt_state if opt_state is None else opt_state
    if opt_state is not None:
        state["opt_state"] = serialization.to_state_dict(
            jax.tree.map(np.asarray, opt_state))
    payload = serialization.msgpack_serialize(state)
    # Write-then-rename: a crash mid-write must not clobber the previous
    # good checkpoint (the whole point of auto-checkpointing).
    tmp = f"{path}.tmp"
    with open(tmp, "wb") as fh:
        fh.write(_MAGIC)
        fh.write(payload)
    import os
    os.replace(tmp, path)


def load_solver(solver, path):
    with open(path, "rb") as fh:
        blob = fh.read()
    if blob.startswith(_MAGIC):
        state = serialization.msgpack_restore(blob[len(_MAGIC):])
    elif blob.startswith(_MAGIC_V1):  # round-1 format: params/losses/step/opt
        state = serialization.msgpack_restore(blob[len(_MAGIC_V1):])
    else:
        raise ValueError(f"{path} is not a pydens_tpu checkpoint")

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
    if "rng_key_data" in state:
        solver._key = jax.random.wrap_key_data(
            jnp.asarray(state["rng_key_data"]))
    if "meta" in state:
        meta = json.loads(state["meta"])
        solver.history = meta["history"]
        solver.model._cond_modes = dict(meta["cond_modes"])
        solver.model._frozen_layers = set(meta["frozen_layers"])
        solver.model._frozen_variables = set(meta["frozen_variables"])
        # Learned loss-balancing weights from a mid-fit snapshot (term
        # order: equation first, then constraints): feed them back as
        # fit(loss_terms={...}) on resume to keep the balanced scaling.
        solver.last_balanced_weights = meta.get("balanced_weights")
    if "opt_state" in state:
        # Stash the raw state dict; Solver.fit grafts it onto the optimizer
        # state of the NEXT fit (freshly prep'd or reused), so Adam moments
        # survive the resume on fresh AND warm solvers alike.  Restoring
        # directly here would be discarded by the next default fit(), which
        # rebuilds the state for its fresh optimizer.
        solver._pending_opt_state = state["opt_state"]


def _check_shape(a, b):
    if jnp.shape(a) != jnp.shape(b):
        raise ValueError(f"shape mismatch {jnp.shape(a)} vs {jnp.shape(b)}")
    return b
