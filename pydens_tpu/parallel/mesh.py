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


def make_mesh(n_devices=None, axis_name="data", devices=None):
    """Create a 1-D device mesh for data-parallel training.

    Parameters
    ----------
    n_devices : int, optional
        Number of devices to use (default: all available).
    axis_name : str
        Mesh axis name the batch is sharded over.
    devices : sequence, optional
        Explicit device list (default ``jax.devices()``).
    """
    devices = list(devices if devices is not None else jax.devices())
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
