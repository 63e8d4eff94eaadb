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
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

import jax
import jax.numpy as jnp

from .dataset import FMRIDataset

DEFAULT_MAX_BYTES = 4 << 30  # refuse to cache datasets larger than 4 GB


class DeviceResidentLoader:
    def __init__(
        self,
        dataset: FMRIDataset,
        batch_size: int = 32,
        shuffle: bool = False,
        seed: int = 0,
        drop_last: bool = False,
        sharding=None,
        max_bytes: int = DEFAULT_MAX_BYTES,
        shard_index: int = 0,
        num_shards: int = 1,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self._rng = np.random.default_rng(seed)
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
        self._vols = jnp.asarray(host["volume"])
        self._covs = jnp.asarray(host["covariates"])
        if sharding is not None:
            # replicate the cached dataset so per-batch gathers stay local
            self._vols = jax.device_put(self._vols, sharding)
            self._covs = jax.device_put(self._covs, sharding)
        self._subjid = host["subjid"]
        self._vol_nums = host["vol_num"]
        # eager per-batch take() pays full dispatch overhead per op (severe
        # on remote-attached devices); one jitted gather keeps it a single
        # cheap dispatch per batch
        self._gather = jax.jit(
            lambda vols, covs, idx: (
                jnp.take(vols, idx, axis=0),
                jnp.take(covs, idx, axis=0),
            )
        )

    def __len__(self) -> int:
        n = len(self._rows)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

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
        order = np.arange(len(self._rows))
        if self.shuffle:
            self._rng.shuffle(order)
        for start in range(0, len(order), self.batch_size):
            sel = order[start : start + self.batch_size]
            if self.drop_last and len(sel) < self.batch_size:
                return
            vols, covs = self._gather(self._vols, self._covs, jnp.asarray(sel))
            yield {
                "volume": vols,
                "covariates": covs,
                "subjid": self._subjid[sel],
                "vol_num": self._vol_nums[sel],
            }


def setup_device_loaders(batch_size=32, train_csv="", test_csv="", seed=0,
                         sharding=None, shard_index=0, num_shards=1):
    """Device-resident analogue of setup_data_loaders (same keys)."""
    train_dataset = FMRIDataset(train_csv)
    test_dataset = FMRIDataset(test_csv)
    return {
        "Shuffled_train": DeviceResidentLoader(
            train_dataset, batch_size, shuffle=True, seed=seed,
            sharding=sharding, shard_index=shard_index, num_shards=num_shards,
        ),
        "UnShuffled_train": DeviceResidentLoader(
            train_dataset, batch_size, shuffle=False, sharding=sharding,
            shard_index=shard_index, num_shards=num_shards,
        ),
        "test": DeviceResidentLoader(
            test_dataset, batch_size, shuffle=False, sharding=sharding,
            shard_index=shard_index, num_shards=num_shards,
        ),
    }
