"""Distributed execution: device meshes and data-parallel sharding."""

from .mesh import make_data_mesh, batch_sharding, replicated_sharding

__all__ = ["make_data_mesh", "batch_sharding", "replicated_sharding"]
