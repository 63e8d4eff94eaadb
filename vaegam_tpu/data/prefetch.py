"""Double-buffered host->HBM prefetch for datasets beyond the device cache.

The device-resident cache (device_cache.py) covers studies up to the HBM
budget (~4 GiB).  Larger corpora (multi-subject MNI-grid runs) previously
fell back to the fully synchronous DataLoader: decode -> stack -> device_put
-> step, serialized — ~37 vols/s on a tunnel-attached chip.

PrefetchLoader pipelines those stages: worker threads run
FMRIDataset.gather (which hits the native C++ NIfTI decoder,
utils/nifti_native.py) and jax.device_put for FUTURE batches while the
device computes on the current one.  A bounded window of `depth` in-flight
batches caps HBM usage at depth * batch_bytes.

Iteration contract matches DataLoader / DeviceResidentLoader:
{covariates, volume, subjid, vol_num} with device arrays for the model
inputs and numpy for the host-side fields; per-epoch reshuffle; optional
row sharding for multi-process data parallelism; optional mesh for
P('data')-sharded batch placement.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Optional

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .dataset import FMRIDataset


class PrefetchLoader:
    def __init__(
        self,
        dataset: FMRIDataset,
        batch_size: int = 32,
        shuffle: bool = False,
        seed: int = 0,
        drop_last: bool = False,
        mesh: Optional[Mesh] = None,
        depth: int = 3,
        workers: int = 1,
        shard_index: int = 0,
        num_shards: int = 1,
    ):
        # defaults measured on the MNI-grid bench (tools/bench_mni_prefetch):
        # ONE worker + depth 3 pipelines best — multiple workers convoy on
        # the device-transfer lock (and the GIL on small hosts): 12.4 vols/s
        # vs 5.6 with two workers vs 11.0 fully synchronous.
        assert depth >= 1
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.depth = depth
        self.workers = workers
        self._rng = np.random.default_rng(seed)
        self._rows = np.arange(len(dataset))[shard_index::num_shards]
        self.batch_sharding = (
            NamedSharding(mesh, P("data")) if mesh is not None else None
        )

    def __len__(self) -> int:
        n = len(self._rows)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _make_batch(self, sel: np.ndarray) -> Dict[str, np.ndarray]:
        host = self.dataset.gather(sel)
        vols, covs = host["volume"], host["covariates"]
        if self.batch_sharding is not None:
            vols = jax.device_put(vols, self.batch_sharding)
            covs = jax.device_put(covs, self.batch_sharding)
        else:
            vols = jax.device_put(vols)
            covs = jax.device_put(covs)
        return {
            "volume": vols,
            "covariates": covs,
            "subjid": host["subjid"],
            "vol_num": host["vol_num"],
        }

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = self._rows.copy()
        if self.shuffle:
            self._rng.shuffle(order)
        batches = []
        for start in range(0, len(order), self.batch_size):
            sel = order[start : start + self.batch_size]
            if self.drop_last and len(sel) < self.batch_size:
                break
            batches.append(sel)

        pool = ThreadPoolExecutor(max_workers=self.workers)
        try:
            in_flight = [
                pool.submit(self._make_batch, sel)
                for sel in batches[: self.depth]
            ]
            next_submit = self.depth
            for _ in range(len(batches)):
                batch = in_flight.pop(0).result()
                if next_submit < len(batches):
                    in_flight.append(
                        pool.submit(self._make_batch, batches[next_submit])
                    )
                    next_submit += 1
                yield batch
        finally:
            pool.shutdown(wait=False, cancel_futures=True)


def setup_prefetch_loaders(batch_size=32, train_csv="", test_csv="", seed=0,
                           mesh=None, depth=3, workers=1,
                           shard_index=0, num_shards=1):
    """Prefetching analogue of setup_data_loaders (same keys)."""
    train_dataset = FMRIDataset(train_csv)
    test_dataset = FMRIDataset(test_csv)
    return {
        "Shuffled_train": PrefetchLoader(
            train_dataset, batch_size, shuffle=True, seed=seed, mesh=mesh,
            depth=depth, workers=workers,
            shard_index=shard_index, num_shards=num_shards,
        ),
        "UnShuffled_train": PrefetchLoader(
            train_dataset, batch_size, shuffle=False, mesh=mesh,
            depth=depth, workers=workers,
            shard_index=shard_index, num_shards=num_shards,
        ),
        "test": PrefetchLoader(
            test_dataset, batch_size, shuffle=False, mesh=mesh,
            depth=depth, workers=workers,
            shard_index=shard_index, num_shards=num_shards,
        ),
    }
