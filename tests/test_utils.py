"""Unit tests for pure utility functions, anchored to reference formulas."""

import numpy as np
import pandas as pd
import pytest
from scipy.stats import gamma

from vaegam_tpu.utils import (
    control_stimulus_to_neural,
    get_xu_ranges,
    hrf,
    hrf_jnp,
    mk_spherical_mask,
    read_design_mat,
    scale_beta_maps,
    stimulus_to_neural,
    str2bool,
    zscore,
)


def test_hrf_formula_matches_reference():
    # reference: utils.py:22-36
    times = np.arange(0, 20, 1.4)
    expected = gamma.pdf(times, 6) - 0.35 * gamma.pdf(times, 12)
    expected = expected / np.max(expected) * 0.6
    np.testing.assert_allclose(hrf(times), expected, rtol=1e-12)
    assert np.max(hrf(times)) == pytest.approx(0.6)


def test_hrf_jnp_matches_numpy():
    times = np.arange(0, 20, 1.4)
    # fp32 on device vs fp64 on host: absolute agreement to ~1e-4 is expected
    np.testing.assert_allclose(np.asarray(hrf_jnp(times)), hrf(times), atol=2e-4)


def test_stimulus_to_neural_first_block_off():
    # reference: utils.py:75-91 — 20 s blocks, block 0 OFF, odd blocks ON
    vol_times = np.arange(1, 99) * 1.4
    res = stimulus_to_neural(vol_times)
    t = vol_times // 20
    expected = np.array([0 if (ti == 0 or ti % 2 == 0) else 1 for ti in t])
    np.testing.assert_array_equal(res, expected)
    assert res[0] == 0  # t < 20 s is OFF


def test_control_stimulus_to_neural_first_block_on():
    # reference: utils.py:93-111 — block 0 ON, odd blocks OFF
    vol_times = np.arange(1, 99) * 1.4
    res = control_stimulus_to_neural(vol_times)
    np.testing.assert_array_equal(res, 1 - stimulus_to_neural(vol_times))


def test_zscore_population_sigma():
    rng = np.random.default_rng(0)
    df = pd.DataFrame(
        {c: rng.normal(5, 3, size=50) for c in ["x", "y", "z", "rot_x", "rot_y", "rot_z"]}
    )
    df["task"] = 1  # untouched column
    out = zscore(df.copy())
    for c in ["x", "y", "z", "rot_x", "rot_y", "rot_z"]:
        assert out[c].mean() == pytest.approx(0.0, abs=1e-12)
        assert out[c].std(ddof=0) == pytest.approx(1.0, rel=1e-12)
    np.testing.assert_array_equal(out["task"], df["task"])


def test_get_xu_ranges(tmp_path):
    cols = ["x", "y", "z", "rot_x", "rot_y", "rot_z"]
    train = pd.DataFrame({c: [0.0, 2.0] for c in cols})
    test = pd.DataFrame({c: [-1.0, 1.0] for c in cols})
    tr, te = tmp_path / "tr.csv", tmp_path / "te.csv"
    train.to_csv(tr)
    test.to_csv(te)
    ranges = get_xu_ranges([str(tr), str(te)])
    for lo, hi in ranges:
        assert lo == pytest.approx(-1.0 - 1e-3)
        assert hi == pytest.approx(2.0 + 1e-3)


def test_str2bool():
    assert str2bool(True) is True
    assert str2bool("yes") and str2bool("TRUE") and str2bool("1")
    assert not (str2bool("no") or str2bool("False") or str2bool("0"))
    with pytest.raises(Exception):
        str2bool("maybe")


def test_mk_spherical_mask_is_l1_ball():
    # reference: utils.py:126-151 — L1 metric (octahedron), center at floor(size/2)
    size, radius = 7, 1
    mask = mk_spherical_mask(size, radius)
    assert mask.shape == (size, size, size)
    assert mask.sum() == 7  # radius-1 L1 ball: center + 6 face neighbors
    c = size // 2
    assert mask[c, c, c] == 1 and mask[c + 1, c, c] == 1 and mask[c + 1, c + 1, c] == 0


def test_mk_spherical_mask_matches_bruteforce():
    size, radius = 9, 3
    mask = mk_spherical_mask(size, radius)
    c = int(np.floor(size / 2))
    brute = np.zeros((size, size, size))
    for x in range(c - radius, c + radius + 1):
        for y in range(c - radius, c + radius + 1):
            for z in range(c - radius, c + radius + 1):
                if radius - abs(c - x) - abs(c - y) - abs(c - z) >= 0:
                    brute[x, y, z] = 1
    np.testing.assert_array_equal(mask, brute)


def test_read_design_mat(tmp_path):
    content = "\n".join(
        ["/NumWaves 2", "/NumPoints 3", "/PPheights 1 1", "", "/Matrix"]
        + ["1.0\t0.5", "0.0\t-0.25", "1.0\t0.125"]
    )
    p = tmp_path / "design.mat"
    p.write_text(content + "\n")
    mat = read_design_mat(str(p))
    np.testing.assert_allclose(mat, [[1.0, 0.5], [0.0, -0.25], [1.0, 0.125]])


def test_scale_beta_maps():
    maps = np.array([[1.0, 2.0, 4.0], [-3.0, 6.0, 3.0]])
    out = scale_beta_maps(maps.copy())
    np.testing.assert_allclose(out[0], [0.25, 0.5, 1.0])
    np.testing.assert_allclose(out[1], [-0.5, 1.0, 0.5])


def test_latent_projection_backend_chain():
    """C6h projection fallbacks (umap-learn absent in env): spectral
    embedding of the n_neighbors=20 kNN graph (UMAP's own init) for real
    datasets, deterministic, cluster-preserving; PCA for tiny inputs."""
    import numpy as np

    from vaegam_tpu.outputs.latents import _project_2d

    rng = np.random.default_rng(0)
    x = np.concatenate(
        [rng.normal(0, 1, (60, 32)), rng.normal(6, 1, (60, 32))]
    )
    p1 = _project_2d(x)
    p2 = _project_2d(x)
    assert p1.shape == (120, 2)
    np.testing.assert_array_equal(p1, p2)  # deterministic
    # the two latent clusters stay separated in the 2D projection
    gap = np.linalg.norm(p1[:60].mean(0) - p1[60:].mean(0))
    assert gap > 1.0 * p1.std()
    # tiny input: degenerate kNN graph -> PCA fallback
    assert _project_2d(rng.normal(size=(10, 32))).shape == (10, 2)


def test_add_signal_stencil_file(tmp_path):
    """--stencil_file supplies the exact binary mask for shape != simple
    (reference add_control_signal.py:89-123's binarized MNIST digit)."""
    from vaegam_tpu.cli.add_signal import (
        THREE_STENCIL,
        build_control_signal,
        load_stencil,
    )

    rng = np.random.default_rng(0)
    mask = (rng.uniform(size=(13, 13)) > 0.6).astype(np.uint8)
    path = tmp_path / "mnist3_mask.npy"
    np.save(path, mask)

    loaded = load_stencil(str(path))
    assert loaded.dtype == np.float64
    np.testing.assert_array_equal(loaded, mask.astype(np.float64))

    sig = build_control_signal("mnist", 500.0, 1, 7, stencil=loaded)
    # inserted rotated -90 deg at [15:25, 34:47, 9:22], like the reference
    from scipy import ndimage

    expected_plane = 500.0 * ndimage.rotate(loaded, -90)
    block = sig[15:25, 34:47, 9:22]
    for k in range(10):
        np.testing.assert_allclose(block[k], expected_plane, atol=1e-9)
    # outside the insert region everything is zero
    total = sig.sum()
    assert total == pytest.approx(10 * expected_plane.sum())

    # default path unchanged
    sig_default = build_control_signal("mnist", 500.0, 1, 7)
    np.testing.assert_allclose(
        sig_default[15:25, 34:47, 9:22][0],
        500.0 * ndimage.rotate(THREE_STENCIL, -90),
        atol=1e-9,
    )

    # validation errors
    np.save(tmp_path / "bad_shape.npy", np.zeros((12, 13)))
    with pytest.raises(ValueError, match="13x13"):
        load_stencil(str(tmp_path / "bad_shape.npy"))
    np.save(tmp_path / "bad_vals.npy", np.full((13, 13), 0.5))
    with pytest.raises(ValueError, match="binary"):
        load_stencil(str(tmp_path / "bad_vals.npy"))


def test_scaled_sphere_params():
    """Sphere placement: exact reference coordinates on the (41,49,35) grid
    (add_control_signal.py:75-87); proportional anchors + L1-radius scale on
    non-reference grids (the MNI oracle arm, BASELINE configs[4])."""
    from vaegam_tpu.cli.add_signal import build_control_signal, scaled_sphere_params

    # reference grid: the reference's exact four anchor corners, no scaling
    starts, rscale = scaled_sphere_params((41, 49, 35))
    assert starts == ((15, 34, 14), (13, 38, 15), (20, 38, 15), (16, 38, 20))
    assert rscale == 1

    # MNI grid: anchors scale by (91/41, 109/49, 91/35) rounded; radius by
    # the mean linear factor rounded (2.35 -> 2)
    starts_mni, rscale_mni = scaled_sphere_params((91, 109, 91))
    assert rscale_mni == 2
    f = (91 / 41, 109 / 49, 91 / 35)
    expected = tuple(
        tuple(int(round(c * fi)) for c, fi in zip(st, f))
        for st in ((15, 34, 14), (13, 38, 15), (20, 38, 15), (16, 38, 20))
    )
    assert starts_mni == expected

    # injected signal lands inside the grid and keeps 4-corner support
    sig = build_control_signal("simple", 700.0, 1, 7, img_shape=(91, 109, 91))
    assert sig.shape == (91, 109, 91)
    assert sig.max() == 700.0
    for (a, b, c) in starts_mni:
        assert sig[a:a + 7, b:b + 7, c:c + 7].max() == 700.0


def test_mnist3_stencil_recipe_golden():
    """The binarization recipe (reference add_control_signal.py:106-113 —
    PIL resize (13,13) bicubic -> /255 -> threshold mean+0.85*std(ddof=0))
    reproduces the committed golden stencil from the committed raw digit.

    The TRUE MNIST train-index-7 digit is unobtainable offline (no network,
    no torchvision); the committed 28x28 digit is a stand-in, but the recipe
    is locked end-to-end: swapping in the real digit bytes regenerates the
    reference's exact mask (tools/make_mnist3_stencil.py docstring)."""
    import os

    from vaegam_tpu.tools.make_mnist3_stencil import binarize_digit

    gdir = os.path.join(os.path.dirname(__file__), "golden")
    raw = np.load(os.path.join(gdir, "raw_digit3_28x28.npy"))
    golden = np.load(os.path.join(gdir, "mnist3_binary_stencil.npy"))
    assert raw.shape == (28, 28) and raw.dtype == np.uint8
    assert golden.shape == (13, 13)
    assert set(np.unique(golden)) <= {0, 1}
    np.testing.assert_array_equal(binarize_digit(raw), golden)
    # recipe details distinguishable on this input: population std (ddof=0)
    # and the 0.85 factor — a wrong threshold changes the on-voxel count
    assert int(golden.sum()) == 41


def test_stencil_injection_reference_placement_parity(tmp_path):
    """--stencil_file injection matches an INDEPENDENT transcription of the
    reference's placement math voxel-for-voxel (add_control_signal.py:
    117-123 rotate/broadcast/insert; :125-130 stimulus series; :137-148
    per-volume add).  VERDICT r4 Missing #2 / C3 closure."""
    import os

    from scipy import ndimage

    from vaegam_tpu.cli import add_signal
    from vaegam_tpu.utils import nifti

    gdir = os.path.join(os.path.dirname(__file__), "golden")
    stencil_path = os.path.join(gdir, "mnist3_binary_stencil.npy")
    stencil = np.load(stencil_path).astype(np.float64)

    rng = np.random.default_rng(7)
    n_vols = 32  # spans ON and OFF blocks (block = 20 s / 1.4 s TR ~ 14)
    orig = rng.uniform(0, 100, size=(41, 49, 35, n_vols))
    subj = tmp_path / "sub-A00012345"
    subj.mkdir()
    orig_path = str(
        subj / "sub-A00012345_preproc_bold_brainmasked_resampled.nii.gz"
    )
    nifti.save(nifti.Nifti1Image(orig, np.eye(4)), orig_path)

    intensity = 731.0
    written = add_signal.main(
        ["--root_dir", str(tmp_path), "--intensity", str(intensity),
         "--shape", "mnist", "--stencil_file", stencil_path]
    )
    assert len(written) == 1
    got = np.array(nifti.load(written[0]).dataobj)

    # --- independent transcription of the reference lines ----------------
    sig = intensity * stencil                               # :115
    rot_sig = ndimage.rotate(sig, -90)                      # :117
    signal = np.broadcast_to(rot_sig, (10, 13, 13))         # :119
    control_sig = np.zeros((41, 49, 35))                    # :121
    control_sig[15:25, 34:47, 9:22] += signal               # :123
    vol_times = np.arange(1, n_vols + 1) * 1.4              # :127-129
    t = vol_times // 20                                     # utils.py:100
    neural = np.array([1 if (i == 0 or i % 2 == 0) else 0 for i in t])
    expected = np.zeros((41, 49, 35, n_vols))
    for j in range(n_vols):                                 # :144-148
        expected[:, :, :, j] = orig[:, :, :, j] + control_sig * neural[j]

    np.testing.assert_array_equal(got, expected)
    # sanity on the discriminating structure: OFF volumes untouched, ON
    # volumes altered exactly on the rotated-stencil voxel set
    assert neural.min() == 0 and neural.max() == 1
    # NOTE: ndimage.rotate's cubic spline leaves small interpolation
    # ripples outside the binary support — reference behavior, preserved
    # exactly by the equality above — so count via the rotated plane
    assert np.count_nonzero(control_sig) == 10 * np.count_nonzero(rot_sig)
