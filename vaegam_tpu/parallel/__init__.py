"""Distributed execution: device meshes and data-parallel sharding."""

from .mesh import (
    batch_sharding,
    global_batch_from_rows,
    init_multihost,
    is_main_process,
    is_multiprocess,
    make_data_mesh,
    put_replicated,
    replicated_sharding,
)

__all__ = ["make_data_mesh", "batch_sharding", "replicated_sharding",
           "init_multihost", "is_multiprocess", "is_main_process",
           "global_batch_from_rows", "put_replicated"]
