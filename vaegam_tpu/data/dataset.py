"""CSV-driven fMRI dataset + batched loaders (reference: DataClass_GP.py).

Sample contract (DataClass_GP.py:19-71): each item is a dict
  covariates: (8,) float32  [task, x, y, z, rot_x, rot_y, rot_z, sex]
  volume:     (41,49,35) float32, globally scaled by 3284.5
  subjid:     int64 subject index (order of first appearance in the csv)
  vol_num:    volume number within the subject's 4D series

CSV schema (written by the preproc CLI, read positionally like the
reference): columns [index, subjid, "volume #", nii_path, task, x, y, z,
rot_x, rot_y, rot_z, sex].

TPU-first changes vs the reference:
  * the reference re-loads and re-decodes the ENTIRE 4D NIfTI for every
    sample (DataClass_GP.py:48-50) — the dominant input cost.  Here each
    4D file is decoded once and memoized (bounded LRU), then sliced.
  * batches are materialized as stacked numpy arrays ready for a single
    jax.device_put per step (no per-item tensor conversion).
  * loaders can shard rows across data-parallel processes
    (shard_index/num_shards) for multi-host input pipelines.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Dict, Iterator

import numpy as np
import pandas as pd


# global intensity scale across all volumes (DataClass_GP.py:49)
GLOBAL_SCALE = 3284.5

_COVARIATE_COLS = 4 + np.arange(8)  # task,x,y,z,rot_x,rot_y,rot_z,sex (iloc)


class _VolumeCache:
    """Bounded LRU cache of decoded 4D NIfTI arrays, keyed by path.

    Thread-safe: PrefetchLoader(workers>1) calls FMRIDataset.gather from
    several pool threads at once — an unlocked OrderedDict would let one
    thread evict an entry between another's get() and move_to_end()
    (KeyError) or over-evict during concurrent put()s.  The lock is not
    held across decode_f32 (the expensive part); a duplicate concurrent
    decode of the same path is benign (last put wins).
    """

    def __init__(self, max_items: int = 32):
        import threading

        self.max_items = max_items
        self._cache: "OrderedDict[str, np.ndarray]" = OrderedDict()
        self._lock = threading.Lock()

    def get(self, path: str) -> np.ndarray:
        with self._lock:
            arr = self._cache.get(path)
            if arr is not None:
                self._cache.move_to_end(path)
                return arr
        from ..utils import nifti_native

        arr = nifti_native.decode_f32(path)  # native C++ path w/ fallback
        self.put(path, arr)
        return arr

    def put(self, path: str, arr: np.ndarray) -> None:
        with self._lock:
            self._cache[path] = arr
            self._cache.move_to_end(path)
            while len(self._cache) > self.max_items:
                self._cache.popitem(last=False)

    def trim(self, max_items: int) -> None:
        with self._lock:
            self.max_items = max_items
            while len(self._cache) > max_items:
                self._cache.popitem(last=False)

    def __len__(self) -> int:
        return len(self._cache)

    def __contains__(self, path: str) -> bool:
        return path in self._cache


class FMRIDataset:
    """Per-volume samples backed by a design CSV."""

    def __init__(self, csv_file: str, scale: float = GLOBAL_SCALE,
                 cache_items: int = 32):
        self.df = pd.read_csv(csv_file)
        self.scale = np.float32(scale)
        self._cache = _VolumeCache(cache_items)
        self._default_cache_items = cache_items
        # subject index by order of first appearance (DataClass_GP.py:31-33)
        self._unique_subjs = self.df.subjid.unique().tolist()
        self._subj_idx = np.array(
            [self._unique_subjs.index(s) for s in self.df.iloc[:, 1]],
            dtype=np.int64,
        )
        self._vol_nums = self.df.iloc[:, 2].to_numpy(dtype=np.int64)
        self._nii_paths = self.df.iloc[:, 3].astype(str).to_numpy()
        self._covariates = self.df.iloc[:, _COVARIATE_COLS].to_numpy(
            dtype=np.float32
        )

    def __len__(self) -> int:
        return len(self.df)

    @property
    def unique_subjs(self):
        return list(self._unique_subjs)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        fmri = self._cache.get(self._nii_paths[idx])
        vol_num = int(self._vol_nums[idx])
        volume = fmri[:, :, :, vol_num] / self.scale
        return {
            "covariates": self._covariates[idx],
            "volume": volume.astype(np.float32),
            "subjid": self._subj_idx[idx],
            "vol_num": np.int64(vol_num),
        }

    def prewarm(self, rows: np.ndarray = None, n_threads: int = 0) -> None:
        """Decode every distinct subject file for `rows` in ONE parallel pass.

        Cold-start ingestion (device-cache builds, first-epoch streaming of a
        new study) otherwise decodes subjects one at a time; the native
        thread pool (utils/nifti_native.decode_many_f32, GIL-free C++)
        overlaps the zlib-inflate + dtype-convert work across cores.  Grows
        the LRU to hold every prewarmed file, pinning the decoded selection
        in host RAM until :meth:`trim_cache` — callers that also stack a
        full fp32 copy of the rows should use ``gather(chunk_files=...)``
        instead, which bounds the peak to one chunk (device-cache builds
        do; see data/device_cache.py).
        """
        paths = self._nii_paths if rows is None else self._nii_paths[rows]
        todo = [p for p in dict.fromkeys(paths) if p not in self._cache]
        if not todo:
            return
        self._cache.max_items = max(
            self._cache.max_items, len(self._cache) + len(todo)
        )
        from ..utils import nifti_native

        for p, arr in zip(todo, nifti_native.decode_many_f32(todo, n_threads)):
            self._cache.put(p, arr)

    def trim_cache(self) -> None:
        """Restore the LRU budget a :meth:`prewarm` grew (evicting oldest)."""
        self._cache.trim(self._default_cache_items)

    def gather(self, idxs: np.ndarray,
               chunk_files: int = 0) -> Dict[str, np.ndarray]:
        """Materialize one batch as stacked arrays (one device_put later).

        ``chunk_files > 0`` bounds host RAM for whole-dataset gathers
        (device-cache builds): subject files are decoded in parallel chunks
        of that many files (native pool) and released as soon as their rows
        are copied into the stacked output, so the peak is the stacked copy
        plus one chunk of decoded 4D files — not the stacked copy plus the
        ENTIRE decoded dataset that a prewarm-then-gather sequence pins.
        Files already in the LRU are reused; cold files decoded this way are
        NOT inserted into it (the caller is consuming them once).
        """
        vols = np.empty((len(idxs),) + self[0]["volume"].shape, np.float32)
        if chunk_files > 0:
            from ..utils import nifti_native

            by_file: Dict[str, list] = {}
            for k, i in enumerate(idxs):
                by_file.setdefault(self._nii_paths[i], []).append(k)
            files = list(by_file)
            for lo in range(0, len(files), chunk_files):
                chunk = files[lo:lo + chunk_files]
                todo = [p for p in chunk if p not in self._cache]
                decoded = dict(zip(todo, nifti_native.decode_many_f32(todo))) \
                    if todo else {}
                for p in chunk:
                    fmri = decoded.get(p)
                    if fmri is None:
                        fmri = self._cache.get(p)
                    for k in by_file[p]:
                        vols[k] = fmri[:, :, :, self._vol_nums[idxs[k]]]
        else:
            for k, i in enumerate(idxs):
                fmri = self._cache.get(self._nii_paths[i])
                vols[k] = fmri[:, :, :, self._vol_nums[i]]
        vols /= self.scale
        return {
            "covariates": self._covariates[idxs],
            "volume": vols,
            "subjid": self._subj_idx[idxs],
            "vol_num": self._vol_nums[idxs],
        }


class DataLoader:
    """Batched iterator over an FMRIDataset.

    shuffle=True reshuffles every epoch (fresh permutation per __iter__),
    mirroring torch's RandomSampler semantics used by the reference
    (DataClass_GP.py:77-87).  Optional row-sharding supports multi-process
    data parallelism (each process sees rows [shard_index::num_shards]).
    """

    def __init__(
        self,
        dataset: FMRIDataset,
        batch_size: int = 32,
        shuffle: bool = False,
        seed: int = 0,
        drop_last: bool = False,
        shard_index: int = 0,
        num_shards: int = 1,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self._rng = np.random.default_rng(seed)
        self._seed = seed
        self._epoch = None
        self._rows = np.arange(len(dataset))[shard_index::num_shards]

    def __len__(self) -> int:
        n = len(self._rows)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int):
        """Derive the next iteration's shuffle from (seed, epoch) instead of
        the stateful stream — the torch DistributedSampler.set_epoch idiom.
        Makes the epoch-k permutation a pure function of the epoch counter,
        so (a) a resumed run reproduces an unbroken run's shuffle sequence
        exactly, and (b) multi-process coherence cannot desync on unequal
        stateful-rng consumption.  The Trainer calls this every epoch."""
        self._epoch = int(epoch)

    def _epoch_rng(self):
        if self._epoch is not None:
            return np.random.default_rng((self._seed, self._epoch))
        return self._rng

    @property
    def num_samples(self) -> int:
        """GLOBAL sample count — the reference's loss denominator
        (len(dataset), vae_reg_GP.py:430).  Deliberately NOT the local row
        count under shard_index/num_shards: sharded loaders report a
        globally-normalized partial loss so every loader kind normalizes by
        the same number (see train/loop.py:_dataset_len)."""
        return len(self.dataset)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = self._rows.copy()
        if self.shuffle:
            self._epoch_rng().shuffle(order)
        for start in range(0, len(order), self.batch_size):
            batch = order[start : start + self.batch_size]
            if self.drop_last and len(batch) < self.batch_size:
                return
            yield self.dataset.gather(batch)


def setup_data_loaders(
    batch_size: int = 32,
    shuffle=(True, False, False),
    train_csv: str = "",
    test_csv: str = "",
    seed: int = 0,
    shard_index: int = 0,
    num_shards: int = 1,
) -> Dict[str, DataLoader]:
    """Three loaders keyed exactly like the reference (DataClass_GP.py:73-89):
    Shuffled_train (training), UnShuffled_train (plots/recons), test."""
    train_dataset = FMRIDataset(train_csv)
    test_dataset = FMRIDataset(test_csv)
    return {
        "Shuffled_train": DataLoader(
            train_dataset, batch_size, shuffle=shuffle[0], seed=seed,
            shard_index=shard_index, num_shards=num_shards,
        ),
        "UnShuffled_train": DataLoader(
            train_dataset, batch_size, shuffle=shuffle[1],
            shard_index=shard_index, num_shards=num_shards,
        ),
        "test": DataLoader(
            test_dataset, batch_size, shuffle=shuffle[2],
            shard_index=shard_index, num_shards=num_shards,
        ),
    }
