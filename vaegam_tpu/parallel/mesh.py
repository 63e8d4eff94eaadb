"""Device mesh + sharding rules for data-parallel VAE-GAM training.

The reference is single-device (vae_reg_GP.py:46-49) — distribution is a
new capability of this framework (SURVEY.md §5.8).  Design:

  * a 1-D mesh over all addressable devices with one axis, 'data';
  * batches (volumes; at multi-subject scale, subjects) are sharded along
    'data'; all parameters, optimizer state, GP banks, and the epsilon map
    are replicated (the model is tiny relative to HBM — no FSDP needed);
  * the training step stays a plain jax.jit: computation follows the input
    shardings, and XLA inserts the psum for the gradient all-reduce over ICI
    automatically.  The (B, B) gain covariance couples batch shards — XLA
    gathers the small (B,) / (B, B) intermediates while the heavy
    (B, 70315) tensors stay sharded;
  * multi-host: jax.distributed.initialize() before mesh construction, and
    per-process loaders shard CSV rows via DataLoader(shard_index, num_shards).

TP/PP/SP/EP/CP and ring attention are out of scope for a 41x49x35 conv-VAE
with no attention (SURVEY.md §2 C11): batch data parallelism is the only
strategy with a payoff here, and it is the one the BASELINE north star asks
for (data-parallel subjects on a v5e-8).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_data_mesh(num_devices: Optional[int] = None) -> Mesh:
    """1-D ('data',) mesh over the first num_devices (default: all) devices."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), axis_names=("data",))


def init_multihost(coordinator_address: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed for multi-host (multi-slice) training.

    On TPU pods the arguments are discovered from the environment; pass them
    explicitly elsewhere.  After this, jax.devices() spans all hosts and
    make_data_mesh() builds the global mesh; per-host input sharding comes
    from DataLoader(shard_index=jax.process_index(),
    num_shards=jax.process_count()).
    """
    kwargs = {}
    if coordinator_address:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis along 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
