"""GLM beta-map regularizer builder CLI.

Flag-for-flag equivalent of the reference get_beta_map_regularizer.py (:18-25):
  --root_dir --output_dir --data_dims --sex_covars_map

Behavioral contract (get_beta_map_regularizer.py:47-107):
  * subject discovery like preproc; one *_corrected.feat dir per subject;
  * stack filtered_func_data.nii.gz into (voxels, sum_T);
  * per-subject FSL design.mat -> [task col | last 6 motion cols];
  * solve the GLM normal equations beta = (G^T G)^{-1} G^T Y^T;
  * append the sex cope map, max-scale each map, write
    scld_GLM_beta_maps.csv with columns [task,x,y,z,xrot,yrot,zrot,sex].

TPU-native: the solve runs on device via jnp.linalg.lstsq (least-squares is
numerically preferable to the explicit normal-equations inverse and agrees
with it whenever G^T G is invertible, which the reference assumes).
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

import numpy as np
import pandas as pd

import jax.numpy as jnp

from ..utils import nifti
from ..utils.stats import read_design_mat, scale_beta_maps
from .preproc import discover_subjects


def build_parser():
    parser = argparse.ArgumentParser(
        description="user args for beta map regularization script."
    )
    parser.add_argument("--root_dir", type=str, metavar="N", default="",
                        help="Root directory containing subdirs for each subject and for .feat FSL analysis for each subject.")
    parser.add_argument("--output_dir", type=str, metavar="N", default="",
                        help="Output where resulting .csv file with beta maps should be written to.")
    parser.add_argument("--data_dims", type=int, metavar="N", default="",
                        nargs="+",
                        help="Dimensions for fMRI data being processed. Should be in order x, y, z, time.")
    parser.add_argument("--sex_covars_map", type=str, metavar="N", default="",
                        help="Full path to sex covariate cope map produced in higher level analysis in FSL.")
    # Extension (not in the reference CLI): solve precision.  float64 matches
    # the reference's numpy normal-equations precision and is the default
    # (see solve_beta_maps docstring for the measured fp32 drift bound).
    parser.add_argument("--solve_dtype", type=str, metavar="N",
                        default="float64", choices=["float32", "float64"],
                        help="Precision of the GLM solve. float64 (default) runs the "
                             "reference-parity host solve; float32 runs on device.")
    return parser


def solve_beta_maps(gamma: np.ndarray, filtered_data: np.ndarray,
                    dtype: str = "float64") -> np.ndarray:
    """beta = argmin ||gamma @ beta - Y^T||^2, batched over voxels.

    dtype='float64' (default): host lstsq at the reference's precision
    (get_beta_map_regularizer.py:94-96 solves the normal equations in float64
    numpy; lstsq agrees whenever G^T G is invertible, which it assumes, and
    is better conditioned).  The design has only 7 columns, so the heavy op
    is the (sum_T, 7)^T @ (sum_T, voxels) product — milliseconds on host;
    running it in fp32 on device saves nothing and was measured to drift up
    to ~1e-2 post-scaling on ill-conditioned correlated-motion fixtures
    (tools/beta_solve_precision_study.py), so fp64 is the default.

    dtype='float32': the on-device solve (kept for very large voxel counts).
    """
    if dtype == "float64":
        sol, *_ = np.linalg.lstsq(
            gamma.astype(np.float64),
            filtered_data.T.astype(np.float64),
            rcond=None,
        )
        return sol
    sol, *_ = jnp.linalg.lstsq(
        jnp.asarray(gamma, jnp.float32), jnp.asarray(filtered_data.T, jnp.float32)
    )
    return np.asarray(sol, dtype=np.float64)


def main(argv=None):
    args = build_parser().parse_args(argv)
    data_dims = args.data_dims

    if not os.path.exists(args.root_dir):
        print("Root dir given does not exist!")
        print("Cannot proceed w/out data!")
        sys.exit(1)
    if args.output_dir == "":
        args.output_dir = os.getcwd()
    elif not os.path.exists(args.output_dir):
        os.makedirs(args.output_dir)

    subjs = discover_subjects(args.root_dir)
    assert len(subjs) != 0, (
        "Could not find any subjID matching expected pattern on root dir."
    )

    feat_dirs = [
        str(d)
        for subj in subjs
        for d in Path(os.path.join(args.root_dir, subj)).rglob(
            "*_corrected.feat"
        )
    ]
    assert len(subjs) == len(feat_dirs), "Not all subjs have .feat directories!"

    # one pass per subject: (T, 7) design block [task | 6 motion] and the
    # (voxels, T) filtered BOLD block; stacked time-wise across subjects
    n_t = data_dims[3]
    design_blocks, bold_blocks = [], []
    for subj, feat in zip(subjs, feat_dirs):
        bold_path = os.path.join(feat, "filtered_func_data.nii.gz")
        assert os.path.exists(bold_path), (
            f"Failed to find filtered data for subj {subj}"
        )
        bold_blocks.append(
            np.asarray(nifti.load(bold_path).dataobj).reshape(-1, n_t)
        )
        dm_path = os.path.join(feat, "design.mat")
        assert os.path.exists(dm_path), (
            f"Failed to find design matrix for subj {subj}"
        )
        dm = read_design_mat(dm_path)
        design_blocks.append(
            np.column_stack([dm[:, 0].reshape(n_t), dm[:, -6:]])
        )

    beta_maps = solve_beta_maps(
        np.concatenate(design_blocks, axis=0),       # (sum_T, 7)
        np.concatenate(bold_blocks, axis=1),         # (voxels, sum_T)
        dtype=args.solve_dtype,
    )

    sex_map = np.asarray(nifti.load(args.sex_covars_map).dataobj)
    with_sex = np.vstack([beta_maps, sex_map.reshape(1, -1)])

    out = os.path.join(args.output_dir, "scld_GLM_beta_maps.csv")
    pd.DataFrame(
        scale_beta_maps(with_sex).T,
        columns=["task", "x", "y", "z", "xrot", "yrot", "zrot", "sex"],
    ).to_csv(out)
    print(out)
    return out


if __name__ == "__main__":
    main()
