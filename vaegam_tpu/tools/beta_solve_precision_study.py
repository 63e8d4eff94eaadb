"""Beta-map GLM solve precision study: fp32 device lstsq vs fp64 normal eqs.

The reference solves the GLM normal equations in float64 numpy
(get_beta_map_regularizer.py:94-96: beta = inv(G^T G) G^T Y^T); our CLI
historically ran a float32 jnp.linalg.lstsq on device.  On well-conditioned
fixtures both agree, but real FSL inputs are harsher: filtered_func_data has
~1e3-1e4-magnitude values, the 6 motion columns are mutually correlated
smooth drifts, and 10 subjects stack to sum_T ~ 1e3 rows.  This study builds
such a fixture, computes the fp64 normal-equations betas as ground truth, and
measures the POST-MAX-SCALING drift (the quantity that feeds the training
loss via glm_reg) of each candidate solve.

Run:  python -m vaegam_tpu.tools.beta_solve_precision_study [--n_subj 10]

Prints one JSON line per solver arm with max/median absolute post-scaling
drift vs the fp64 reference, and the fixture's condition number.
"""

from __future__ import annotations

import argparse
import json

import numpy as np

from ..cli.beta_maps import solve_beta_maps
from ..utils.signals import hrf, stimulus_to_neural
from ..utils.stats import scale_beta_maps


def make_realistic_fixture(n_subj=10, n_t=98, n_vox=70315, seed=0,
                           corr=0.98, value_scale=8000.0):
    """Synthetic stacked-FSL fixture at realistic scale and conditioning.

    - task column: HRF-convolved block series (like FSL's design.mat col 0);
    - 6 motion columns: a shared smooth random-walk drift plus small
      independent components -> pairwise correlation ~`corr` (real head
      motion: translations/rotations co-drift), worst-case conditioning;
    - Y: betas ~ N(0, 50) on a few hundred "active" voxels + noise, offset
      to filtered_func_data's ~1e3-1e4 magnitude.
    """
    rng = np.random.default_rng(seed)
    tr = 1.4
    times = np.arange(1, n_t + 1) * tr
    task_neural = stimulus_to_neural(times).astype(np.float64)
    h = hrf(np.arange(0, 20, tr))
    task = np.convolve(task_neural, h)[:n_t]

    designs = []
    for _ in range(n_subj):
        # shared smooth drift (cumulative sum of smoothed noise)
        base = np.cumsum(rng.normal(size=n_t))
        base = np.convolve(base, np.ones(9) / 9.0, mode="same")
        base = (base - base.mean()) / (base.std() + 1e-12)
        mot = np.empty((n_t, 6))
        for j in range(6):
            indep = np.cumsum(rng.normal(size=n_t))
            indep = (indep - indep.mean()) / (indep.std() + 1e-12)
            col = corr * base + np.sqrt(1.0 - corr**2) * indep
            # FSL design.mat motion columns are raw parameter estimates:
            # translations ~ mm (1e-1..1), rotations ~ radians (1e-3..1e-2)
            scale = 0.5 if j < 3 else 5e-3
            mot[:, j] = scale * col
        designs.append(np.column_stack([task, mot]))
    gamma = np.concatenate(designs, axis=0)          # (sum_T, 7)

    true_beta = np.zeros((7, n_vox))
    active = rng.choice(n_vox, size=512, replace=False)
    true_beta[:, active] = rng.normal(scale=50.0, size=(7, active.size))
    y = gamma @ true_beta                            # (sum_T, n_vox)
    y += rng.normal(scale=25.0, size=y.shape)
    y += value_scale                                 # BOLD baseline offset
    return gamma, y.T.copy()                         # Y as (voxels, sum_T)


def reference_solve_f64(gamma: np.ndarray, filtered: np.ndarray) -> np.ndarray:
    """The reference's exact computation (get_beta_map_regularizer.py:94-96)."""
    g = gamma.astype(np.float64)
    return np.linalg.inv(g.T @ g) @ g.T @ filtered.T.astype(np.float64)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n_subj", type=int, default=10)
    p.add_argument("--n_vox", type=int, default=70315)
    p.add_argument("--corr", type=float, default=0.98)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    gamma, y = make_realistic_fixture(
        n_subj=args.n_subj, n_vox=args.n_vox, corr=args.corr, seed=args.seed
    )
    cond = float(np.linalg.cond(gamma))
    ref = scale_beta_maps(reference_solve_f64(gamma, y))

    results = {"cond_gamma": cond, "sum_T": gamma.shape[0]}
    for dtype in ("float32", "float64"):
        sol = solve_beta_maps(gamma, y, dtype=dtype)
        drift = np.abs(scale_beta_maps(sol) - ref)
        results[dtype] = {
            "max_drift": float(drift.max()),
            "median_drift": float(np.median(drift)),
            "p99_drift": float(np.quantile(drift, 0.99)),
        }
    print(json.dumps(results))
    return results


if __name__ == "__main__":
    main()
