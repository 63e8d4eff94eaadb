"""Native C++ NIfTI decoder vs the pure-numpy codec."""

import os
import subprocess

import numpy as np
import pytest

from vaegam_tpu.utils import nifti, nifti_native

NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")


@pytest.fixture(scope="module", autouse=True)
def build_native():
    if not nifti_native.available():
        subprocess.run(["make", "-C", NATIVE_DIR], check=False)
    if not nifti_native.available():
        pytest.skip("native library not built and build failed")


@pytest.mark.parametrize("gz", [False, True])
@pytest.mark.parametrize("dtype", [np.float32, np.float64, np.int16, np.uint8])
def test_native_matches_python_codec(tmp_path, gz, dtype):
    rng = np.random.default_rng(0)
    if np.issubdtype(dtype, np.integer):
        data = rng.integers(0, 100, size=(7, 6, 5, 3)).astype(dtype)
    else:
        data = rng.normal(size=(7, 6, 5, 3)).astype(dtype)
    path = str(tmp_path / ("a.nii.gz" if gz else "a.nii"))
    nifti.save(nifti.Nifti1Image(data, np.eye(4)), path)
    got = nifti_native.decode_f32(path)
    assert got.dtype == np.float32
    np.testing.assert_allclose(got, data.astype(np.float32), rtol=1e-6)


def test_native_scl_slope_inter(tmp_path):
    raw = np.arange(60, dtype=np.int16).reshape(5, 4, 3)
    path = str(tmp_path / "s.nii")
    nifti.save(nifti.Nifti1Image(raw, np.eye(4)), path)
    blob = bytearray(open(path, "rb").read())
    blob[112:116] = np.float32(0.5).tobytes()
    blob[116:120] = np.float32(3.0).tobytes()
    open(path, "wb").write(bytes(blob))
    got = nifti_native.decode_f32(path)
    np.testing.assert_allclose(got, raw * 0.5 + 3.0, rtol=1e-6)


def test_decode_many_parallel(tmp_path):
    rng = np.random.default_rng(1)
    paths, datas = [], []
    for i in range(5):
        d = rng.normal(size=(6, 5, 4)).astype(np.float32)
        p = str(tmp_path / f"m{i}.nii.gz")
        nifti.save(nifti.Nifti1Image(d, np.eye(4)), p)
        paths.append(p)
        datas.append(d)
    outs = nifti_native.decode_many_f32(paths, n_threads=3)
    for got, want in zip(outs, datas):
        np.testing.assert_array_equal(got, want)


def test_prewarm_parallel_ingestion(tmp_path):
    """Dataset.prewarm pool-decodes every distinct subject file once and
    gather() afterward returns exactly the lazily-decoded batches."""
    import pandas as pd

    from vaegam_tpu.data import FMRIDataset

    rng = np.random.default_rng(3)
    rows = []
    vols_by_file = {}
    for s in range(4):
        vols = rng.uniform(0, 3000, size=(7, 6, 5, 3)).astype(np.float32)
        nii = str(tmp_path / f"subj{s}.nii.gz")
        nifti.save(nifti.Nifti1Image(vols, np.eye(4)), nii)
        vols_by_file[nii] = vols
        for v in range(3):
            rows.append((f"s{s}", v, nii, 1, .1, .2, .3, .4, .5, .6, 0))
    df = pd.DataFrame(rows, columns=["subjid", "volume #", "nii_path", "task",
                                     "x", "y", "z", "rot_x", "rot_y", "rot_z",
                                     "sex"])
    csv = str(tmp_path / "d.csv")
    df.to_csv(csv)

    lazy = FMRIDataset(csv)
    warm = FMRIDataset(csv, cache_items=2)  # prewarm must grow the LRU
    warm.prewarm()
    assert all(p in warm._cache for p in vols_by_file)
    idxs = np.arange(len(df))
    got = warm.gather(idxs)
    want = lazy.gather(idxs)
    for k in ("covariates", "volume", "subjid", "vol_num"):
        np.testing.assert_array_equal(got[k], want[k])
    # idempotent: a second prewarm decodes nothing (cache keys unchanged)
    warm.prewarm()
    assert len(warm._cache._cache) == len(vols_by_file)


def test_native_error_codes(tmp_path):
    with pytest.raises(ValueError):
        nifti_native.decode_f32(str(tmp_path / "missing.nii"))
    bad = tmp_path / "bad.nii"
    bad.write_bytes(b"\x00" * 400)
    with pytest.raises(ValueError):
        nifti_native.decode_f32(str(bad))


def test_dataset_uses_native_path(tmp_path):
    """The loader's volume cache must produce identical batches either way."""
    import pandas as pd

    from vaegam_tpu.data import FMRIDataset

    rng = np.random.default_rng(2)
    vols = rng.uniform(0, 3000, size=(41, 49, 35, 4)).astype(np.float32)
    nii = str(tmp_path / "v.nii.gz")
    nifti.save(nifti.Nifti1Image(vols, np.eye(4)), nii)
    rows = [("s1", v, nii, 1, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0) for v in range(4)]
    df = pd.DataFrame(rows, columns=["subjid", "volume #", "nii_path", "task",
                                     "x", "y", "z", "rot_x", "rot_y", "rot_z",
                                     "sex"])
    csv = str(tmp_path / "d.csv")
    df.to_csv(csv)
    ds = FMRIDataset(csv)
    item = ds[2]
    np.testing.assert_allclose(item["volume"], vols[:, :, :, 2] / 3284.5,
                               rtol=1e-6)


def test_native_batch_writer_byte_identical(tmp_path):
    """write_batch_f32 must emit the exact bytes of utils.nifti.save."""
    if not nifti_native.writer_available():
        pytest.skip("native writer symbol absent (stale .so)")
    rng = np.random.default_rng(7)
    shape = (11, 9, 7)
    affine = np.array([[2.0, 0, 0, -13.0], [0, 2.0, 0, 5.0],
                       [0, 0, 2.0, 1.0], [0, 0, 0, 1.0]])
    # a reference header carrying non-default fields that must survive
    ref_hdr = nifti.Nifti1Header.default()
    ref_hdr["descrip"] = b"ref-desc"
    ref_hdr["pixdim"] = [1, 2, 2, 2, 1.4, 1, 1, 1]

    n = 5
    data = rng.normal(size=(n, int(np.prod(shape)))).astype(np.float32)
    header = nifti.encode_header(ref_hdr, shape, np.float32, affine)
    native_paths = [str(tmp_path / f"nat_{i}.nii") for i in range(n)]
    nifti_native.write_batch_f32(header, data, shape, native_paths)

    for i in range(n):
        py_path = str(tmp_path / f"py_{i}.nii")
        nifti.save(
            nifti.Nifti1Image(data[i].reshape(shape), affine, ref_hdr),
            py_path,
        )
        with open(py_path, "rb") as f:
            expected = f.read()
        with open(native_paths[i], "rb") as f:
            got = f.read()
        assert got == expected
    # and the decode round-trips
    back = np.asarray(nifti.load(native_paths[2]).dataobj)
    np.testing.assert_array_equal(back, data[2].reshape(shape))


def test_native_batch_writer_fallback(tmp_path, monkeypatch):
    """The pure-Python fallback path writes the same bytes too."""
    rng = np.random.default_rng(8)
    shape = (5, 4, 3)
    data = rng.normal(size=(2, 60)).astype(np.float32)
    header = nifti.encode_header(None, shape, np.float32, np.eye(4))
    monkeypatch.setattr(nifti_native, "writer_available", lambda: False)
    paths = [str(tmp_path / f"fb_{i}.nii") for i in range(2)]
    nifti_native.write_batch_f32(header, data, shape, paths)
    py = str(tmp_path / "fb_ref.nii")
    nifti.save(nifti.Nifti1Image(data[1].reshape(shape), np.eye(4)), py)
    with open(py, "rb") as f:
        expected = f.read()
    with open(paths[1], "rb") as f:
        assert f.read() == expected


def test_batch_writer_rejects_row_mismatch(tmp_path):
    """Fewer data rows than paths must raise on the host (the native side
    would otherwise read past the buffer); wrong voxel count likewise."""
    shape = (5, 4, 3)
    data = np.zeros((2, 60), np.float32)
    header = nifti.encode_header(None, shape, np.float32, np.eye(4))
    with pytest.raises(ValueError):
        nifti_native.write_batch_f32(
            header, data, shape, [str(tmp_path / f"{i}.nii") for i in range(3)]
        )
    with pytest.raises(ValueError):
        nifti_native.write_batch_f32(
            header, np.zeros((2, 59), np.float32), shape,
            [str(tmp_path / f"{i}.nii") for i in range(2)]
        )
