"""Flagship end-to-end test: the synthetic-control pipeline through the CLIs.

Mirrors the reference's empirical-validation loop (SURVEY.md §4): inject a
known signal -> build csv -> short train -> outputs tree, then the
--recons_only checkpoint round-trip.
"""

import os
import re

import numpy as np
import pandas as pd
import pytest

from e2e_helpers import make_subject_tree
from vaegam_tpu.cli import add_signal, preproc
from vaegam_tpu.cli import train as train_cli
from vaegam_tpu.utils import nifti

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("subjects"))
    make_subject_tree(root, n_subjs=2, n_vols=8, intensity=0.0)
    return root


def test_add_signal_cli(pipeline):
    written = add_signal.main(
        ["--root_dir", pipeline, "--intensity", "400", "--shape", "simple",
         "--nii_file_pattern", "sub-A000*_resampled.nii.gz"]
    )
    assert len(written) == 2
    for path in written:
        assert "_ALTERED_simple_400_simple_ts_" in path
        img = nifti.load(path)
        assert img.shape == (41, 49, 35, 8)
    # ON volumes got the four octahedra; volume 0 is ON (control series)
    orig = nifti.load(written[0].split("_ALTERED_")[0] + ".nii.gz")
    delta = np.array(nifti.load(written[0]).dataobj)[:, :, :, 0] - np.array(
        orig.dataobj
    )[:, :, :, 0]
    assert delta.max() == pytest.approx(400.0)
    assert (delta > 0).sum() == 4 * 7  # 4 spheres x 7 voxels (r=1 L1 ball)


def test_preproc_cli(pipeline, tmp_path_factory):
    save_dir = str(tmp_path_factory.mktemp("csvs"))
    out_csv = preproc.main(
        ["--data_dir", pipeline, "--save_dir", save_dir, "--control",
         "--control_int", "400", "--set_tag", "TRAIN",
         "--nii_file_pattern", "*_ALTERED_simple_400_*.nii.gz",
         "--mot_file_pattern", "sub-A000*_desc-confounds_regressors_*.tsv",
         "--sex_info", os.path.join(pipeline, "sex_info.csv")]
    )
    assert re.search(r"preproc_dset_zscored_\d\d_\d\d_\d{4}_TRAIN_large3_400_"
                     r"control_simple_ts\.csv$", out_csv)
    df = pd.read_csv(out_csv)
    assert list(df.columns[1:]) == ["subjid", "volume #", "nii_path", "task",
                                    "x", "y", "z", "rot_x", "rot_y", "rot_z",
                                    "sex"]
    assert len(df) == 16  # 2 subjs x 8 vols
    assert set(df["task"]) == {1}  # 8 vols x 1.4s all inside first ON block
    for c in ["x", "y", "z", "rot_x", "rot_y", "rot_z"]:
        assert abs(df[c].mean()) < 1e-10
    globals()["_E2E_CSV"] = out_csv  # pass to the training stage


@pytest.mark.slow
def test_train_cli_end_to_end(pipeline, tmp_path_factory):
    csv = globals()["_E2E_CSV"]
    save_dir = str(tmp_path_factory.mktemp("run_out"))
    train_cli.main(
        ["--train_csv", csv, "--test_csv", csv, "--save_dir", save_dir,
         "--batch-size", "8", "--epochs", "2", "--seed", "1",
         "--save_freq", "1", "--test_freq", "1", "--split", "8",
         "--glm_reg_scale", "0.0", "--neural_covariates", "False",
         "--nf", "2", "--num_latents", "8"]
    )
    # checkpoint written at epoch 1 (save skips epoch 0)
    assert os.path.exists(os.path.join(save_dir, "checkpoint_001.tar"))
    # latent plot
    assert os.path.exists(os.path.join(save_dir, "002_temp.pdf"))
    # GP plots dir: 6 csvs + 6 pdfs
    gp_dir = os.path.join(save_dir, "002_GP_plots")
    files = os.listdir(gp_dir)
    assert sum(f.endswith(".csv") for f in files) == 6
    assert sum(f.endswith(".pdf") for f in files) == 6
    # reconstruction tree: per-volume maps + averages
    recon_dir = os.path.join(save_dir, "reconstructions", "002_model_recons")
    subjs = sorted(os.listdir(recon_dir))
    assert len(subjs) == 2
    vol0 = os.path.join(recon_dir, subjs[0], "vol_0")
    names = sorted(os.listdir(vol0))
    assert names == sorted(
        f"recon_{k}.nii" for k in
        ["base", "task", "x_mot", "y_mot", "z_mot", "pitch_mot", "roll_mot",
         "yaw_mot", "sex", "full_rec"]
    )
    img = nifti.load(os.path.join(vol0, "recon_base.nii"))
    assert img.shape == (41, 49, 35)
    avg_dir = os.path.join(save_dir, "reconstructions", "002_avg_model_recons")
    for key in ["base", "task", "full_rec", "sex", "x_mot", "pitch_mot"]:
        assert os.path.exists(os.path.join(avg_dir, f"{key}_avg.nii"))
        assert os.path.exists(os.path.join(avg_dir, subjs[0], f"{key}_avg.nii"))
    # TB event files exist
    assert os.path.isdir(os.path.join(save_dir, "run"))
    globals()["_E2E_SAVE_DIR"] = save_dir


def test_train_cli_data_parallel(tmp_path_factory):
    """The configs[4] north-star path THROUGH THE CLI: --data_parallel with
    the default device cache on the virtual 8-device mesh (conftest).  The
    mesh must be built before the loaders so batches land P('data')-sharded
    and the gather-fused step shards the batch axis."""
    csv = globals()["_E2E_CSV"]
    save_dir = str(tmp_path_factory.mktemp("dp_out"))
    train_cli.main(
        ["--train_csv", csv, "--test_csv", csv, "--save_dir", save_dir,
         "--batch-size", "16", "--epochs", "2", "--seed", "1",
         "--save_freq", "1", "--test_freq", "1", "--split", "8",
         "--glm_reg_scale", "0.0", "--neural_covariates", "False",
         "--nf", "2", "--num_latents", "8", "--data_parallel", "True",
         "--recons_only", "False"]
    )
    assert os.path.exists(os.path.join(save_dir, "checkpoint_001.tar"))
    recon_dir = os.path.join(save_dir, "reconstructions", "002_model_recons")
    assert len(os.listdir(recon_dir)) == 2


@pytest.mark.slow
def test_recons_only_from_checkpoint(tmp_path_factory):
    csv = globals()["_E2E_CSV"]
    prev = globals()["_E2E_SAVE_DIR"]
    save_dir = str(tmp_path_factory.mktemp("recons_out"))
    ckpt = os.path.join(prev, "checkpoint_001.tar")
    train_cli.main(
        ["--train_csv", csv, "--test_csv", csv, "--save_dir", save_dir,
         "--batch-size", "8", "--split", "8", "--glm_reg_scale", "0.0",
         "--neural_covariates", "False", "--nf", "2", "--num_latents", "8",
         "--from_ckpt", "True", "--ckpt_path", ckpt, "--recons_only", "True"]
    )
    # epoch restored from ckpt (epoch counter was 2 at save time of epoch-1
    # checkpoint... the reference stores the post-increment epoch)
    recon_root = os.path.join(save_dir, "reconstructions")
    dirs = os.listdir(recon_root)
    assert any(d.endswith("_model_recons") for d in dirs)
    assert any(d.endswith("_avg_model_recons") for d in dirs)
    # recons_only without from_ckpt must be rejected
    with pytest.raises(AssertionError):
        train_cli.main(
            ["--train_csv", csv, "--test_csv", csv, "--save_dir", save_dir,
             "--recons_only", "True"]
        )
