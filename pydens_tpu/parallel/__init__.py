"""Parallelism: device meshes, shardings and multi-process coordination."""

from .mesh import make_mesh, batch_sharding, replicated
from . import distributed

__all__ = ["make_mesh", "batch_sharding", "replicated", "distributed"]
