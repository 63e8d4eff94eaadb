"""beta_maps CLI e2e: fake FSL .feat tree with known ground-truth betas."""

import os

import numpy as np
import pandas as pd
import pytest

from vaegam_tpu.cli import beta_maps
from vaegam_tpu.utils import nifti

DIMS = (6, 5, 4, 20)  # x, y, z, T
N_VOX = 6 * 5 * 4


def _write_design_mat(path, mat):
    lines = ["/NumWaves %d" % mat.shape[1], "/NumPoints %d" % mat.shape[0],
             "/PPheights 1", "", "/Matrix"]
    for row in mat:
        lines.append("\t".join(f"{v:.6f}" for v in row))
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


@pytest.fixture(scope="module")
def feat_tree(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("feat_root"))
    rng = np.random.default_rng(0)
    true_betas = rng.normal(size=(7, N_VOX))  # task + 6 motion
    for s in range(2):
        subj = f"sub-A000{60 + s}"
        feat = os.path.join(root, subj, "run1_corrected.feat")
        os.makedirs(feat)
        # design: task + 2 distractor cols + 6 motion (task first, motion last)
        task = rng.integers(0, 2, DIMS[3]).astype(float)
        distract = rng.normal(size=(DIMS[3], 2))
        motion = rng.normal(size=(DIMS[3], 6))
        full_dm = np.column_stack([task, distract, motion])
        _write_design_mat(os.path.join(feat, "design.mat"), full_dm)
        dm = np.column_stack([task, motion])  # what the CLI extracts
        data = (dm @ true_betas).T.reshape(DIMS)  # exact linear model
        nifti.save(
            nifti.Nifti1Image(data.astype(np.float32), np.eye(4)),
            os.path.join(feat, "filtered_func_data.nii.gz"),
        )
    sex_map = rng.normal(size=DIMS[:3]).astype(np.float32)
    sex_path = os.path.join(root, "sex_cope.nii.gz")
    nifti.save(nifti.Nifti1Image(sex_map, np.eye(4)), sex_path)
    return root, sex_path, true_betas, sex_map


def test_beta_maps_cli_recovers_betas(feat_tree, tmp_path):
    root, sex_path, true_betas, sex_map = feat_tree
    out = beta_maps.main(
        ["--root_dir", root, "--output_dir", str(tmp_path),
         "--data_dims", *map(str, DIMS), "--sex_covars_map", sex_path]
    )
    df = pd.read_csv(out)
    assert list(df.columns[1:]) == ["task", "x", "y", "z", "xrot", "yrot",
                                    "zrot", "sex"]
    got = df.iloc[:, 1:].to_numpy().T  # (8, voxels)
    # identical design for both subjects => per-voxel exact recovery after
    # max-scaling (the CLI divides each map by its own max)
    expected = np.concatenate([true_betas, sex_map.reshape(1, -1)], axis=0)
    for i in range(8):
        np.testing.assert_allclose(
            got[i], expected[i] / expected[i].max(), rtol=2e-3, atol=2e-4
        )


def test_beta_maps_cli_missing_feat_dir_rejected(tmp_path):
    root = tmp_path / "r"
    (root / "sub-A00070").mkdir(parents=True)  # subject without .feat
    with pytest.raises(AssertionError, match="feat"):
        beta_maps.main(
            ["--root_dir", str(root), "--output_dir", str(tmp_path),
             "--data_dims", "2", "2", "2", "3", "--sex_covars_map", "x"]
        )


def test_solve_dtype_precision_bounds():
    """Pin the GLM-solve precision bounds measured by
    tools/beta_solve_precision_study.py on the realistic ill-conditioned
    fixture (cond(Gamma) ~ 1.4e3, values ~8e3, correlated motion columns):
    the float64 host path reproduces the reference's float64 normal
    equations (get_beta_map_regularizer.py:94-96) to ~1e-12 post-scaling,
    while the float32 device path drifts past 1e-3 — which is why float64
    is the --solve_dtype default."""
    from vaegam_tpu.tools.beta_solve_precision_study import (
        make_realistic_fixture,
        reference_solve_f64,
    )
    from vaegam_tpu.utils.stats import scale_beta_maps

    gamma, y = make_realistic_fixture(n_subj=10, n_vox=3000, seed=0)
    assert np.linalg.cond(gamma) > 300  # ill-conditioned by construction
    ref = scale_beta_maps(reference_solve_f64(gamma, y))

    drift64 = np.abs(
        scale_beta_maps(beta_maps.solve_beta_maps(gamma, y, dtype="float64"))
        - ref
    ).max()
    assert drift64 < 1e-10, drift64

    drift32 = np.abs(
        scale_beta_maps(beta_maps.solve_beta_maps(gamma, y, dtype="float32"))
        - ref
    ).max()
    # fp32 drift magnitude is CODEGEN-dependent (measured 3.2e-5 under the
    # test env's cached CPU kernels vs 4.9e-3 with a fresh XLA compile on
    # the same fixture — the instability is the finding), so only the upper
    # bound is pinned here; the study tool records the per-backend numbers.
    assert drift32 < 0.05, drift32
    assert drift64 < drift32  # fp64 is strictly tighter
