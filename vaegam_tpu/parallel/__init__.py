"""Distributed execution: device meshes and data-parallel sharding."""

from .mesh import make_data_mesh, batch_sharding, replicated_sharding, init_multihost

__all__ = ["make_data_mesh", "batch_sharding", "replicated_sharding", "init_multihost"]
