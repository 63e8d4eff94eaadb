"""Tests for the native NIfTI-1 codec (vaegam_tpu.utils.nifti)."""

import gzip

import numpy as np
import pytest

from vaegam_tpu.utils import nifti


def test_roundtrip_nii(tmp_path):
    rng = np.random.default_rng(0)
    data = rng.normal(size=(5, 6, 7)).astype(np.float32)
    affine = np.diag([2.0, 2.0, 2.0, 1.0])
    affine[:3, 3] = [-10.0, 5.0, 3.0]
    path = str(tmp_path / "a.nii")
    nifti.save(nifti.Nifti1Image(data, affine), path)
    img = nifti.load(path)
    np.testing.assert_array_equal(np.array(img.dataobj), data)
    np.testing.assert_allclose(img.affine, affine)


def test_roundtrip_nii_gz_4d(tmp_path):
    rng = np.random.default_rng(1)
    data = (rng.normal(size=(4, 3, 2, 5)) * 100).astype(np.float64)
    path = str(tmp_path / "b.nii.gz")
    nifti.save(nifti.Nifti1Image(data, np.eye(4)), path)
    with open(path, "rb") as f:
        assert f.read(2) == b"\x1f\x8b"  # actually gzipped
    img = nifti.load(path)
    assert img.shape == (4, 3, 2, 5)
    np.testing.assert_array_equal(np.array(img.dataobj), data)


def test_header_template_preserved(tmp_path):
    data = np.ones((3, 3, 3), dtype=np.float32)
    img0 = nifti.Nifti1Image(data, np.eye(4))
    img0.header["descrip"] = b"hello-template"
    p1 = str(tmp_path / "c.nii")
    nifti.save(img0, p1)
    loaded = nifti.load(p1)
    # reference pattern: nib.Nifti1Image(arr, ref.affine, ref.header)
    img1 = nifti.Nifti1Image(data * 2, loaded.affine, loaded.header)
    p2 = str(tmp_path / "d.nii")
    nifti.save(img1, p2)
    reloaded = nifti.load(p2)
    assert bytes(reloaded.header["descrip"]).rstrip(b"\x00") == b"hello-template"
    np.testing.assert_array_equal(np.array(reloaded.dataobj), data * 2)


def test_scl_slope_inter_applied(tmp_path):
    # hand-craft a file with slope/inter set; int16 payload
    raw = np.arange(24, dtype=np.int16).reshape(2, 3, 4)
    path = str(tmp_path / "e.nii")
    img = nifti.Nifti1Image(raw, np.eye(4))
    nifti.save(img, path)
    # patch slope/inter in the written header bytes (offsets 112/116, f4)
    with open(path, "rb") as f:
        blob = bytearray(f.read())
    blob[112:116] = np.float32(2.0).tobytes()
    blob[116:120] = np.float32(-1.0).tobytes()
    with open(path, "wb") as f:
        f.write(bytes(blob))
    out = np.array(nifti.load(path).dataobj)
    np.testing.assert_allclose(out, raw.astype(np.float64) * 2.0 - 1.0)


def test_fortran_order_layout(tmp_path):
    # voxel (1,0,0) must be the SECOND element on disk (x fastest)
    data = np.zeros((2, 2, 2), dtype=np.float32)
    data[1, 0, 0] = 7.0
    path = str(tmp_path / "f.nii")
    nifti.save(nifti.Nifti1Image(data, np.eye(4)), path)
    with open(path, "rb") as f:
        blob = f.read()
    vox = np.frombuffer(blob, dtype="<f4", offset=352, count=8)
    assert vox[1] == 7.0 and vox[0] == 0.0


def test_nibabel_compat_if_available(tmp_path):
    nib = pytest.importorskip("nibabel")
    rng = np.random.default_rng(2)
    data = rng.normal(size=(3, 4, 5)).astype(np.float32)
    path = str(tmp_path / "g.nii.gz")
    nib.save(nib.Nifti1Image(data, np.eye(4)), path)
    img = nifti.load(path)
    np.testing.assert_array_equal(np.array(img.dataobj), data)


def test_bad_magic_raises(tmp_path):
    p = tmp_path / "junk.nii"
    p.write_bytes(b"\x00" * 400)
    with pytest.raises(ValueError):
        nifti.load(str(p))
