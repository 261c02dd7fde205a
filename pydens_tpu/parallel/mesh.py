"""Device-mesh helpers for data-parallel PINN training.

The reference has zero parallelism (SURVEY §2, verified): training is
single-process CPU.  The workload is embarrassingly data-parallel over
collocation points — each iteration's batch is i.i.d.-sampled and the loss is
a mean over points — so the TPU-native scale-out is a 1-D mesh with the batch
sharded over ICI.  Parameters stay replicated; XLA inserts the gradient
``psum`` automatically from the sharding constraint the Solver places on the
sampled batch.  No custom communication backend is needed (or wanted): the
collectives are XLA's, riding ICI within a slice.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "batch_sharding", "replicated"]


def make_mesh(n_devices=None, axis_name="data", devices=None, shape=None,
              axis_names=None):
    """Create a device mesh for parallel training.

    1-D (default): the collocation batch is sharded over ``axis_name``
    (data parallelism).  N-D: pass ``shape`` and ``axis_names`` — an axis
    named ``'models'`` shards ensemble members (``Solver(n_models=K)``)
    across devices, composing ensemble-parallelism with data-parallelism::

        mesh = make_mesh(shape=(2, 4), axis_names=("models", "data"))
        Solver(pde, ..., n_models=8, mesh=mesh)

    Parameters
    ----------
    n_devices : int, optional
        Number of devices for a 1-D mesh (default: all available).
    axis_name : str
        1-D mesh axis name.
    devices : sequence, optional
        Explicit device list (default ``jax.devices()``).
    shape : tuple of int, optional
        N-D mesh shape; its product selects that many devices.
    axis_names : tuple of str, optional
        One name per mesh axis (required with ``shape``).
    """
    devices = list(devices if devices is not None else jax.devices())
    if shape is not None:
        if axis_names is None or len(axis_names) != len(shape):
            raise ValueError("axis_names must name every axis of `shape`")
        need = int(np.prod(shape))
        if need > len(devices):
            raise ValueError(
                f"mesh shape {shape} needs {need} devices but only "
                f"{len(devices)} are available")
        return Mesh(np.asarray(devices[:need]).reshape(shape),
                    tuple(axis_names))
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested {n_devices} devices but only "
                f"{len(devices)} are available")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh, ndim=2):
    """NamedSharding placing the leading axis over the mesh's first axis."""
    spec = [mesh.axis_names[0]] + [None] * (ndim - 1)
    return NamedSharding(mesh, P(*spec))


def replicated(mesh):
    """Fully-replicated NamedSharding for parameters."""
    return NamedSharding(mesh, P())
