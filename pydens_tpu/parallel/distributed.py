"""Multi-process (multi-host / multi-slice) training support.

The reference is single-process CPU (SURVEY §2, verified); its blueprint
scoped multi-slice DCN out of parity but required that "the mesh abstraction
should not preclude it".  This module is that path: one JAX process per host
(multi-controller SPMD), a mesh over the *global* device list, and the same
``Solver`` API — the training step is already pure SPMD (device-side
sampling from a shared key, sharding-constraint-driven collectives), so the
only multi-process work is plumbing:

* every process calls :func:`initialize` first (JAX's coordination service;
  on TPU pods the topology is auto-detected, on CPU/GPU pass the coordinator
  address and process ids explicitly);
* ``make_mesh()`` then builds over ``jax.devices()``, which is the GLOBAL
  list after initialization — nothing else changes;
* host-side state that must be identical everywhere (the flat parameter
  vector, optimizer state, loss-balancing weights) is assembled into
  replicated global arrays with :func:`to_global_replicated` — the Solver
  does this automatically when its mesh spans processes;
* per-process host samplers feed the global batch through
  :func:`global_batch` (``jax.make_array_from_callback``): every process
  samples the same full batch from the same seed and contributes the shards
  its local devices own.

Every process must drive the Solver in lockstep (same ``fit``/``predict``
calls — the standard JAX multi-controller contract).  Losses and other
replicated outputs are readable on every process (``np.asarray`` works on
fully-replicated global arrays).

Scope, stated honestly: tested topology is multi-process over one flat
mesh (2 coordinated CPU processes x 4 virtual devices in
``tests/test_distributed.py`` — the same multi-controller code path a
v5e-256 pod slice uses, minus real ICI).  Multi-SLICE meshes (DCN axis
between slices, ``jax.sharding`` device order by slice) build on exactly
these primitives but have no test hardware here; PARITY.md records this
boundary.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import NamedSharding, PartitionSpec as P

__all__ = ["initialize", "is_multi_process", "to_global_replicated",
           "global_batch", "fetch"]


def initialize(coordinator_address=None, num_processes=None, process_id=None,
               **kwargs):
    """Join the multi-process cluster (call before ANY other JAX use).

    Thin wrapper over ``jax.distributed.initialize``: on TPU pods all
    arguments are auto-detected from the environment; on CPU/GPU clusters
    pass ``coordinator_address='host:port'``, ``num_processes`` and this
    process's ``process_id`` explicitly.  After this returns,
    ``jax.devices()`` lists the global device set and ``make_mesh()``
    builds cluster-wide meshes.
    """
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id, **kwargs)


def is_multi_process(mesh):
    """True iff the mesh's devices span more than one JAX process."""
    return len({d.process_index for d in mesh.devices.flat}) > 1


def to_global_replicated(tree, mesh):
    """Assemble per-process host-local leaves into replicated global arrays
    over ``mesh``.

    Every process must hold the same values (deterministic same-seed init
    guarantees this for the Solver's parameters/optimizer state).  Leaves
    that are already global (not fully addressable) pass through untouched,
    so re-entering a fit with carried-over state is a no-op.
    """
    from jax.experimental import multihost_utils

    def conv(leaf):
        if isinstance(leaf, jax.Array) and not leaf.is_fully_addressable:
            return leaf  # already a global array
        return multihost_utils.host_local_array_to_global_array(
            np.asarray(leaf), mesh, P())

    return jax.tree.map(conv, tree)


def global_batch(mesh, pts, spec):
    """Build a global device array for host-sampled collocation points.

    ``pts`` is the FULL batch, identically computed on every process (same
    sampler seed); each process contributes the shards its local devices
    own.  ``spec`` is the ``PartitionSpec`` placing the batch axis on the
    mesh's data axis.
    """
    pts = np.asarray(pts)
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(pts.shape, sharding,
                                        lambda idx: pts[idx])


def fetch(tree):
    """Materialize a pytree of (possibly global, replicated) arrays to host
    numpy — e.g. to hand a distributed-trained parameter set to a
    single-process serving job.  Works on every process."""
    return jax.tree.map(np.asarray, tree)
