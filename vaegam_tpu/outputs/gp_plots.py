"""GP posterior plots + CSVs for the 6 motion covariates.

Reference behavior (vae_reg_GP.py:622-689): for each non-binary covariate,
evaluate the gain posterior over ALL csv rows, write a sorted CSV
{epoch:03d}_GP_{cov}_full.csv and a PDF GP_{cov}_full_set.pdf into
{epoch:03d}_GP_plots/.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ..models import gp as gp_mod  # noqa: E402
from ..models.vaegam import MOTION_SLICE, gp_transforms, resolve_qu_S  # noqa: E402
from ..parallel import is_main_process

MOTION_CSV_COLS = ["x", "y", "z", "rot_x", "rot_y", "rot_z"]
MOTION_KEYS = ["x", "y", "z", "xrot", "yrot", "zrot"]


def plot_GPs(trainer, csv_file: str = "", save_dir: str = ""):
    # GP params are replicated; every process runs the (replicated-only)
    # posterior eval, but only main writes the CSVs/PDFs
    write_files = is_main_process()
    outdir_name = str(trainer.epoch).zfill(3) + "_GP_plots"
    plot_dir = os.path.join(save_dir, outdir_name)
    if write_files:
        os.makedirs(plot_dir, exist_ok=True)

    data = pd.read_csv(csv_file)
    all_covariates = data[MOTION_CSV_COLS].to_numpy()

    gp_p = jax.tree_util.tree_map(jnp.asarray, trainer.params["gp"])
    gp_p["qu_S"] = resolve_qu_S(gp_p)
    kvar, ls = gp_transforms(gp_p, trainer.config)
    xu = trainer.consts["xu"]
    sa = np.asarray(gp_p["sa"])
    std = np.exp(np.asarray(gp_p["logstd"]))

    # Diag-only posterior: the plots/CSVs only need marginal variances, and a
    # study-sized CSV (1e4+ rows) would make the dense (N, N) Sigma >= 400 MB
    # per covariate; evaluate_posterior_diag is O(N P) memory instead.
    eval_fn = jax.jit(gp_mod.evaluate_posterior_diag)
    for j, name in enumerate(MOTION_KEYS):
        cov_idx = MOTION_SLICE.start + j  # position in the 8-covariate bank
        xq = jnp.asarray(all_covariates[:, j], trainer.config.dtype)
        f_bar, var = eval_fn(
            xu[j], kvar[j], ls[j], gp_p["qu_m"][j], gp_p["qu_S"][j], xq
        )
        beta_mean = sa[cov_idx] * np.asarray(xq) + np.asarray(f_bar)
        beta_var = (
            std[cov_idx] ** 2 * np.asarray(xq) ** 2 + np.asarray(var)
        )
        if not write_files:
            continue
        frame = pd.DataFrame(
            {
                "xq": all_covariates[:, j],
                "mean": beta_mean.tolist(),
                "vars": beta_var.tolist(),
            }
        ).sort_values(by=["xq"])
        outfull_name = str(trainer.epoch).zfill(3) + "_GP_" + name + "_full.csv"
        frame.to_csv(os.path.join(plot_dir, outfull_name))

        plt.clf()
        plt.plot(frame["xq"], frame["mean"], c="darkblue", alpha=0.5,
                 label="Beta posterior mean")
        two_sigma = 2 * np.sqrt(np.maximum(frame["vars"], 0.0))
        plt.fill_between(frame["xq"], frame["mean"] - two_sigma,
                         frame["mean"] + two_sigma,
                         color="lightblue", alpha=0.3, label="2 sigma")
        plt.locator_params(axis="x", nbins=6)
        plt.locator_params(axis="y", nbins=4)
        plt.legend(loc="best")
        plt.title(f"GP Plot {name}_full_set")
        plt.xlabel("Covariate")
        plt.ylabel("Beta Ouput")
        plt.savefig(os.path.join(plot_dir, f"GP_{name}_full_set.pdf"))
