"""Device-resident dataset: upload all volumes to HBM once, gather on device.

The reference streams every sample from host each step (DataClass_GP.py);
for datasets that fit in HBM (a 10-subject study at the reference grid is
~270 MB; a v5e chip has 16 GB) the TPU-native design is to device_put the
whole (N, D, H, W) volume tensor once and index it per step — eliminating
the per-step host->device copy entirely.

DeviceResidentLoader mirrors the DataLoader iteration contract
({covariates, volume, subjid, vol_num} batches; per-epoch reshuffle) but
yields device arrays for the model inputs.  Host-side fields (subjid,
vol_num) stay numpy for the output writers.

Data parallelism: pass a jax.sharding.Mesh with a 'data' axis.  The cached
dataset is REPLICATED over the mesh (it is small; replication keeps every
per-batch gather local, no collective), and gathered batches are constrained
to P('data') so the downstream jitted train step shards the batch axis and
XLA inserts the gradient all-reduce over ICI.
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .dataset import FMRIDataset

DEFAULT_MAX_BYTES = 4 << 30  # refuse to cache datasets larger than 4 GB


class DeviceResidentLoader:
    def __init__(
        self,
        dataset: Optional[FMRIDataset],
        batch_size: int = 32,
        shuffle: bool = False,
        seed: int = 0,
        drop_last: bool = False,
        mesh: Optional[Mesh] = None,
        max_bytes: int = DEFAULT_MAX_BYTES,
        shard_index: int = 0,
        num_shards: int = 1,
        _arrays: Optional[dict] = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self._rng = np.random.default_rng(seed)

        if _arrays is not None:  # from_arrays path
            host = _arrays
            self._rows = np.arange(len(host["volume"]))[shard_index::num_shards]
            host = {k: v[self._rows] for k, v in host.items()}
        else:
            self._rows = np.arange(len(dataset))[shard_index::num_shards]
            n = len(self._rows)
            sample = dataset[0]
            nbytes = n * sample["volume"].size * 4
            if nbytes > max_bytes:
                raise ValueError(
                    f"dataset needs {nbytes >> 20} MiB on device, over the "
                    f"{max_bytes >> 20} MiB cache limit — use the streaming "
                    "DataLoader instead"
                )
            host = dataset.gather(self._rows)

        self.mesh = mesh
        self.batch_sharding = (
            NamedSharding(mesh, P("data")) if mesh is not None else None
        )
        vols_np = np.asarray(host["volume"], np.float32)
        covs_np = np.asarray(host["covariates"], np.float32)
        if mesh is not None:
            # replicate the cached dataset so per-batch gathers stay local
            repl = NamedSharding(mesh, P())
            self._vols = jax.device_put(vols_np, repl)
            self._covs = jax.device_put(covs_np, repl)
        else:
            # device_put's DMA path — jnp.asarray routes through eager-op
            # machinery, ~60x slower on a tunnel-attached chip
            self._vols = jax.device_put(vols_np)
            self._covs = jax.device_put(covs_np)
        self._subjid = host["subjid"]
        self._vol_nums = host["vol_num"]
        # eager per-batch take() pays full dispatch overhead per op (severe
        # on remote-attached devices); one jitted gather keeps it a single
        # cheap dispatch per batch.  Under a mesh, the gathered batch is
        # constrained to P('data') so consumers see a data-sharded batch.
        batch_sharding = self.batch_sharding

        def _gather_fn(vols, covs, idx):
            v = jnp.take(vols, idx, axis=0)
            c = jnp.take(covs, idx, axis=0)
            if batch_sharding is not None:
                v = jax.lax.with_sharding_constraint(v, batch_sharding)
                c = jax.lax.with_sharding_constraint(c, batch_sharding)
            return v, c

        self._gather = jax.jit(_gather_fn)

    @classmethod
    def from_arrays(
        cls,
        volumes: np.ndarray,
        covariates: np.ndarray,
        subjid: Optional[np.ndarray] = None,
        vol_nums: Optional[np.ndarray] = None,
        **kwargs,
    ) -> "DeviceResidentLoader":
        """Build a loader from in-memory arrays (no CSV/NIfTI tree needed).

        Used by the driver's multi-chip dryrun and synthetic-data tests;
        iteration contract is identical to the dataset-backed constructor.
        """
        n = len(volumes)
        arrays = {
            "volume": np.asarray(volumes, np.float32),
            "covariates": np.asarray(covariates, np.float32),
            "subjid": subjid if subjid is not None else np.zeros(n, np.int64),
            "vol_num": vol_nums if vol_nums is not None else np.arange(n),
        }
        return cls(None, _arrays=arrays, **kwargs)

    def __len__(self) -> int:
        n = len(self._rows)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    @property
    def num_samples(self) -> int:
        """Loader-local sample count (len(dataset) when no from_arrays/shard)."""
        return len(self._rows)

    def iter_index_batches(self) -> Iterator[np.ndarray]:
        """Yield per-batch index arrays (host numpy) for gather-fused steps.

        Same shuffle stream as __iter__ would consume; callers gather on
        device inside their own jitted step (Trainer._gather_train_step).
        """
        order = np.arange(len(self._rows))
        if self.shuffle:
            self._rng.shuffle(order)
        for start in range(0, len(order), self.batch_size):
            sel = order[start : start + self.batch_size]
            if self.drop_last and len(sel) < self.batch_size:
                return
            yield sel

    def __iter__(self) -> Iterator[dict]:
        for sel in self.iter_index_batches():
            # numpy sel enters the jitted gather via the fast arg-transfer
            # path (eager jnp.asarray pays a tunnel dispatch per batch)
            vols, covs = self._gather(self._vols, self._covs, np.asarray(sel))
            yield {
                "volume": vols,
                "covariates": covs,
                "subjid": self._subjid[sel],
                "vol_num": self._vol_nums[sel],
            }


def setup_device_loaders(batch_size=32, train_csv="", test_csv="", seed=0,
                         mesh=None, shard_index=0, num_shards=1):
    """Device-resident analogue of setup_data_loaders (same keys)."""
    train_dataset = FMRIDataset(train_csv)
    test_dataset = FMRIDataset(test_csv)
    return {
        "Shuffled_train": DeviceResidentLoader(
            train_dataset, batch_size, shuffle=True, seed=seed,
            mesh=mesh, shard_index=shard_index, num_shards=num_shards,
        ),
        "UnShuffled_train": DeviceResidentLoader(
            train_dataset, batch_size, shuffle=False, mesh=mesh,
            shard_index=shard_index, num_shards=num_shards,
        ),
        "test": DeviceResidentLoader(
            test_dataset, batch_size, shuffle=False, mesh=mesh,
            shard_index=shard_index, num_shards=num_shards,
        ),
    }
