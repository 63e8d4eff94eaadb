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
  * multi-host: jax.distributed.initialize() before mesh construction.
    Every process walks the SAME seeded global batch order; batches are
    assembled as coherent global arrays (global_batch_from_rows /
    replicated device caches), NOT by stamping process-local shards with
    global shardings.  Params/opt state are placed with put_replicated,
    which builds a coherent multi-process replicated array from the
    (deterministically identical) per-process values.

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
    explicitly elsewhere (or via VAEGAM_COORDINATOR / VAEGAM_NUM_PROCESSES /
    VAEGAM_PROCESS_ID env vars, used by the 2-process CLI test).  After this,
    jax.devices() spans all hosts and make_data_mesh() builds the global
    mesh; per-process input assembly goes through global_batch_from_rows /
    replicated device caches (see data/prefetch.py, data/device_cache.py).
    """
    import os

    if coordinator_address is None:
        coordinator_address = os.environ.get("VAEGAM_COORDINATOR")
    if num_processes is None and "VAEGAM_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["VAEGAM_NUM_PROCESSES"])
    if process_id is None and "VAEGAM_PROCESS_ID" in os.environ:
        process_id = int(os.environ["VAEGAM_PROCESS_ID"])
    kwargs = {}
    if coordinator_address:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def is_multiprocess() -> bool:
    """True when jax.distributed spans more than one controller process."""
    return jax.process_count() > 1


def is_main_process() -> bool:
    """True on the process that owns file outputs (checkpoints, TB, NIfTIs).

    In multi-controller runs every process executes the same SPMD program,
    but host-side artifacts must be written exactly once.
    """
    return jax.process_index() == 0


def global_batch_from_rows(sharding: NamedSharding, n_rows: int,
                           fetch_rows) -> jax.Array:
    """Assemble a global P('data')-sharded batch from a per-row fetch fn.

    ``fetch_rows(lo, hi)`` must return the host numpy block for global batch
    rows [lo, hi) — it is called ONCE PER ADDRESSABLE SHARD, so in an
    N-process run each process only materializes (decodes / reads) its own
    1/N of the batch.  This is the multi-process-correct replacement for
    ``jax.device_put(local_rows, P('data'))``, which would stamp
    process-local data with a global sharding (different bytes per host =
    silent incoherence; see jax.make_array_from_callback semantics).

    Works for uneven batches (n_rows not divisible by the mesh size): shard
    index maps follow the sharding's own devices_indices_map.
    """
    sample = fetch_rows(0, 0)  # shape/dtype probe, zero rows
    global_shape = (n_rows,) + sample.shape[1:]

    def cb(index):
        row_slice = index[0]
        lo = row_slice.start or 0
        hi = row_slice.stop if row_slice.stop is not None else n_rows
        block = fetch_rows(lo, hi)
        return block[(slice(None),) + index[1:]]

    return jax.make_array_from_callback(global_shape, sharding, cb)


def put_replicated(tree, mesh: Mesh):
    """Place a pytree fully replicated over the mesh, multi-process-safe.

    Single-process: plain jax.device_put (fast path).  Multi-process:
    jax.device_put cannot place host values onto non-addressable devices,
    so each leaf is built with jax.make_array_from_callback under a P()
    spec — every process supplies its own (identical-by-construction)
    bytes for its addressable devices.  Callers must guarantee the value
    is deterministic across processes (same-seed init, loaded checkpoint).
    """
    repl = NamedSharding(mesh, P())
    if jax.process_count() == 1:
        return jax.device_put(tree, repl)

    def put_leaf(leaf):
        host = np.asarray(leaf)
        return jax.make_array_from_callback(
            host.shape, repl, lambda idx: host[idx]
        )

    return jax.tree_util.tree_map(put_leaf, tree)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis along 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
