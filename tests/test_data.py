"""Dataset/loader contract tests (reference DataClass_GP.py)."""

import numpy as np
import pytest

from e2e_helpers import make_design_csv, make_subject_tree
from vaegam_tpu.data import GLOBAL_SCALE, DataLoader, FMRIDataset, setup_data_loaders


@pytest.fixture(scope="module")
def csvs(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("fake_subjects"))
    make_subject_tree(root, n_subjs=2, n_vols=6)
    train = make_design_csv(root, str(tmp_path_factory.mktemp("csv") / "train.csv"))
    return root, train


def test_dataset_item_contract(csvs):
    _, train = csvs
    ds = FMRIDataset(train)
    assert len(ds) == 12  # 2 subjects x 6 vols
    item = ds[0]
    assert item["covariates"].shape == (8,)
    assert item["volume"].shape == (41, 49, 35)
    assert item["subjid"] == 0 and ds[6]["subjid"] == 1
    assert item["vol_num"] == 0 and ds[5]["vol_num"] == 5
    # global scaling by 3284.5 applied
    from vaegam_tpu.utils import nifti
    raw = np.asarray(nifti.load(ds._nii_paths[0]).dataobj)[:, :, :, 0]
    np.testing.assert_allclose(
        item["volume"], raw / GLOBAL_SCALE, rtol=1e-6
    )


def test_gather_matches_items(csvs):
    _, train = csvs
    ds = FMRIDataset(train)
    batch = ds.gather(np.array([0, 3, 7]))
    assert batch["volume"].shape == (3, 41, 49, 35)
    for k, i in enumerate([0, 3, 7]):
        item = ds[i]
        np.testing.assert_allclose(batch["volume"][k], item["volume"], rtol=1e-6)
        np.testing.assert_array_equal(batch["covariates"][k], item["covariates"])
        assert batch["subjid"][k] == item["subjid"]


def test_gather_chunked_matches_unchunked(csvs):
    """chunk_files bounds device-cache-build RAM: same bytes, and cold
    files decoded by the chunked path are consumed without growing the
    LRU past its budget."""
    _, train = csvs
    ds = FMRIDataset(train, cache_items=1)
    idxs = np.arange(len(ds))
    chunked = ds.gather(idxs, chunk_files=1)
    assert len(ds._cache) <= 1  # one-shot decodes were not inserted
    plain = FMRIDataset(train).gather(idxs)
    for key in ("volume", "covariates", "subjid", "vol_num"):
        np.testing.assert_array_equal(chunked[key], plain[key])


def test_volume_cache_thread_safety(csvs):
    """Concurrent gathers under a tiny LRU budget (PrefetchLoader with
    workers>1 hits the shared cache from several pool threads; unlocked,
    an eviction between get() and move_to_end() raises KeyError)."""
    from concurrent.futures import ThreadPoolExecutor

    _, train = csvs
    ds = FMRIDataset(train, cache_items=1)  # force constant eviction
    idxs = [np.array([i % 12, (i + 7) % 12]) for i in range(64)]
    with ThreadPoolExecutor(max_workers=4) as pool:
        results = list(pool.map(ds.gather, idxs))
    for sel, batch in zip(idxs, results):
        for k, i in enumerate(sel):
            np.testing.assert_allclose(
                batch["volume"][k], ds[i]["volume"], rtol=1e-6
            )
    assert len(ds._cache) <= 1


def test_prewarm_trim_cache_releases_budget(csvs):
    _, train = csvs
    ds = FMRIDataset(train, cache_items=1)
    ds.prewarm()  # grows the LRU to hold both subject files
    assert len(ds._cache) == 2
    ds.trim_cache()
    assert len(ds._cache) == 1 and ds._cache.max_items == 1


def test_loader_shuffle_and_coverage(csvs):
    _, train = csvs
    ds = FMRIDataset(train)
    loader = DataLoader(ds, batch_size=5, shuffle=True, seed=0)
    seen = []
    orders = []
    for _ in range(2):
        epoch_ids = []
        for batch in loader:
            epoch_ids.extend(
                (batch["subjid"] * 100 + batch["vol_num"]).tolist()
            )
        orders.append(tuple(epoch_ids))
        seen.append(sorted(epoch_ids))
    assert seen[0] == seen[1]           # full coverage every epoch
    assert orders[0] != orders[1]       # reshuffled across epochs
    assert len(seen[0]) == 12


def test_setup_data_loaders_keys(csvs):
    _, train = csvs
    loaders = setup_data_loaders(batch_size=4, train_csv=train, test_csv=train)
    assert set(loaders) == {"Shuffled_train", "UnShuffled_train", "test"}
    assert len(loaders["Shuffled_train"].dataset) == 12
    # unshuffled loader preserves csv order
    first = next(iter(loaders["UnShuffled_train"]))
    np.testing.assert_array_equal(first["vol_num"], [0, 1, 2, 3])


def test_sharded_loader_partitions_rows(csvs):
    _, train = csvs
    ds = FMRIDataset(train)
    all_rows = []
    for shard in range(3):
        loader = DataLoader(ds, batch_size=4, shard_index=shard, num_shards=3)
        for batch in loader:
            all_rows.extend(
                (batch["subjid"] * 100 + batch["vol_num"]).tolist()
            )
    assert len(all_rows) == 12 and len(set(all_rows)) == 12


def test_prefetch_loader_matches_dataloader(csvs):
    """PrefetchLoader yields the same batches as DataLoader (same shuffle
    stream), just pipelined and already device-resident."""
    from vaegam_tpu.data import PrefetchLoader

    _, train = csvs
    ds = FMRIDataset(train)
    plain = DataLoader(ds, batch_size=4, shuffle=True, seed=5)
    pref = PrefetchLoader(ds, batch_size=4, shuffle=True, seed=5, depth=2)
    assert len(plain) == len(pref)
    for a, b in zip(plain, pref):
        np.testing.assert_array_equal(a["volume"], np.asarray(b["volume"]))
        np.testing.assert_array_equal(
            a["covariates"], np.asarray(b["covariates"])
        )
        np.testing.assert_array_equal(a["subjid"], b["subjid"])


def test_prefetch_loader_sharded_mesh(csvs):
    """Under a mesh the prefetched batches land P('data')-sharded."""
    from jax.sharding import PartitionSpec as P

    from vaegam_tpu.data import PrefetchLoader
    from vaegam_tpu.parallel import make_data_mesh

    _, train = csvs
    ds = FMRIDataset(train)
    mesh = make_data_mesh()
    pref = PrefetchLoader(ds, batch_size=8, shuffle=False, mesh=mesh)
    batch = next(iter(pref))
    assert batch["volume"].sharding.spec == P("data")
    assert batch["covariates"].sharding.spec == P("data")


def test_prefetch_bf16_transfer_quantization(csvs):
    """transfer_dtype=bfloat16: float32 restored on device, values within
    bf16 quantization of the fp32 stream (r3: halved tunnel bytes)."""
    import jax.numpy as jnp

    from vaegam_tpu.data import PrefetchLoader

    _, train = csvs
    ds = FMRIDataset(train)
    fp32 = PrefetchLoader(ds, batch_size=4, shuffle=False)
    bf16 = PrefetchLoader(ds, batch_size=4, shuffle=False,
                          transfer_dtype="bfloat16")
    a = next(iter(fp32))["volume"]
    b = next(iter(bf16))["volume"]
    assert b.dtype == jnp.float32
    # bf16 relative quantization is 2^-8; volumes are O(1) after scaling
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=4e-3)
    assert not np.array_equal(np.asarray(a), np.asarray(b))  # really quantized


def test_device_cache_bf16_and_shared_view(csvs):
    """cache_dtype=bfloat16 halves the HBM cache; gathers restore float32.
    sharing_cache views reuse the same HBM buffers (no second upload)."""
    import jax.numpy as jnp

    from vaegam_tpu.data.device_cache import DeviceResidentLoader

    _, train = csvs
    ds = FMRIDataset(train)
    fp32 = DeviceResidentLoader(ds, batch_size=4, shuffle=False)
    bf16 = DeviceResidentLoader(ds, batch_size=4, shuffle=False,
                                cache_dtype="bfloat16")
    assert bf16._vols.dtype == jnp.bfloat16
    assert bf16._vols.nbytes == fp32._vols.nbytes // 2
    a = next(iter(fp32))["volume"]
    b = next(iter(bf16))["volume"]
    assert b.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=4e-3)

    view = DeviceResidentLoader.sharing_cache(bf16, batch_size=4,
                                              shuffle=False)
    assert view._vols is bf16._vols  # same HBM buffer, not a copy
    np.testing.assert_array_equal(np.asarray(next(iter(view))["volume"]),
                                  np.asarray(b))


def test_setup_device_loaders_auto_half_fallback(csvs, capsys):
    """auto cache_dtype: fp32 when it fits, float16 when only half
    precision fits (f16 over bf16: 8x finer mantissa for [0,1] volumes at
    the same bytes), ValueError when nothing fits (callers stream)."""
    import jax.numpy as jnp
    import pytest as _pytest

    from vaegam_tpu.data import setup_device_loaders

    _, train = csvs
    vols_bytes = 12 * 41 * 49 * 35 * 4  # 12 samples fp32
    loaders = setup_device_loaders(batch_size=4, train_csv=train,
                                   test_csv=train,
                                   max_bytes=vols_bytes)
    assert loaders["Shuffled_train"]._vols.dtype == jnp.float32
    loaders = setup_device_loaders(batch_size=4, train_csv=train,
                                   test_csv=train,
                                   max_bytes=vols_bytes // 2)
    assert loaders["Shuffled_train"]._vols.dtype == jnp.float16
    with _pytest.raises(ValueError):
        setup_device_loaders(batch_size=4, train_csv=train, test_csv=train,
                             max_bytes=vols_bytes // 4)


def test_auto_precheck_avoids_wasted_upload(csvs, monkeypatch):
    """auto cache_dtype must reject a too-big dtype BEFORE decoding and
    uploading anything: previously a failing fp32 attempt fully gathered
    + device_put the train cache, then redid everything in bf16."""
    from vaegam_tpu.data import setup_device_loaders

    _, train = csvs
    calls = []
    orig = FMRIDataset.gather

    def spy(self, rows, **kw):
        calls.append(len(rows))
        return orig(self, rows, **kw)

    monkeypatch.setattr(FMRIDataset, "gather", spy)
    vols_bytes = 12 * 41 * 49 * 35 * 4  # 12 samples fp32
    loaders = setup_device_loaders(batch_size=4, train_csv=train,
                                   test_csv=train,
                                   max_bytes=vols_bytes // 2)
    # identical train/test CSVs: ONE decode total — the test loader shares
    # the train HBM cache (r5: a second upload doubled both the footprint
    # and the tunnel time); the fp32 attempt must not have gathered at all
    assert calls == [12]
    assert loaders["test"]._vols is loaders["Shuffled_train"]._vols


def test_num_samples_consistent_across_loader_kinds(csvs):
    """Every loader kind reports the GLOBAL sample count so epoch loss is
    normalized identically (r2 advisor finding)."""
    from vaegam_tpu.data import PrefetchLoader
    from vaegam_tpu.data.device_cache import DeviceResidentLoader

    _, train = csvs
    ds = FMRIDataset(train)
    assert DataLoader(ds, batch_size=4).num_samples == 12
    assert DataLoader(ds, batch_size=4, shard_index=1,
                      num_shards=3).num_samples == 12
    assert PrefetchLoader(ds, batch_size=4).num_samples == 12
    assert PrefetchLoader(ds, batch_size=4, shard_index=1,
                          num_shards=3).num_samples == 12
    assert DeviceResidentLoader(ds, batch_size=4).num_samples == 12
    assert DeviceResidentLoader(ds, batch_size=4, shard_index=1,
                                num_shards=3).num_samples == 12


def test_wide_eval_view(csvs):
    """Output-stage eval widening: same samples, same order, wider batches;
    device-cache views reuse the HBM cache; width capped by the maps-output
    HBM budget."""
    from vaegam_tpu.data import (DataLoader, PrefetchLoader, wide_eval_view)
    from vaegam_tpu.data.device_cache import DeviceResidentLoader

    _, train = csvs
    ds = FMRIDataset(train)
    img_dim = int(np.prod(ds[0]["volume"].shape))

    for loader in (DataLoader(ds, batch_size=4),
                   PrefetchLoader(ds, batch_size=4, shuffle=False),
                   DeviceResidentLoader(ds, batch_size=4, shuffle=False)):
        wide = wide_eval_view(loader, img_dim, width=8)
        assert wide.batch_size == 8
        base = np.concatenate(
            [np.asarray(b["volume"]) for b in loader], axis=0)
        wvols = np.concatenate(
            [np.asarray(b["volume"]) for b in wide], axis=0)
        np.testing.assert_allclose(base, wvols, atol=1e-6)
        if isinstance(loader, DeviceResidentLoader):
            assert wide._vols is loader._vols  # shared HBM cache

    # cap: a tiny maps budget forces the width back down; the budget covers
    # TWO 10 x B x img_dim fp32 blocks (the depth-2 recon pipeline's peak)
    capped = wide_eval_view(DataLoader(ds, batch_size=4), img_dim,
                            width=128,
                            max_map_bytes=2 * 10 * img_dim * 4 * 5)
    assert capped.batch_size == 5

    # the view preserves the loader's exact wire dtype (float16 != bfloat16)
    for wire in ("float16", "bfloat16"):
        pf = PrefetchLoader(ds, batch_size=4, shuffle=False,
                            transfer_dtype=wire)
        wide = wide_eval_view(pf, img_dim, width=8)
        assert np.dtype(wide.transfer_dtype).name == wire


def test_half_precision_float16_wire_and_cache(csvs):
    """float16 wire/cache: same bytes as bfloat16, 8x finer quantization
    for the [0,1]-scaled volumes (10- vs 7-bit mantissa)."""
    import jax.numpy as jnp

    from vaegam_tpu.data import PrefetchLoader
    from vaegam_tpu.data.device_cache import DeviceResidentLoader

    _, train = csvs
    ds = FMRIDataset(train)
    fp32 = DeviceResidentLoader(ds, batch_size=4, shuffle=False)
    f16 = DeviceResidentLoader(ds, batch_size=4, shuffle=False,
                               cache_dtype="float16")
    assert f16._vols.dtype == jnp.float16
    assert f16._vols.nbytes == fp32._vols.nbytes // 2
    a = np.asarray(next(iter(fp32))["volume"])
    b = np.asarray(next(iter(f16))["volume"])
    assert next(iter(f16))["volume"].dtype == jnp.float32
    np.testing.assert_allclose(a, b, atol=5e-4)  # 8x tighter than bf16's 4e-3

    stream = PrefetchLoader(ds, batch_size=4, shuffle=False,
                            transfer_dtype="float16")
    c = np.asarray(next(iter(stream))["volume"])
    assert next(iter(stream))["volume"].dtype == jnp.float32
    np.testing.assert_allclose(a, c, atol=5e-4)
