"""End-to-end synthetic-control validation (BASELINE configs[0]).

The reference's de-facto correctness oracle (SURVEY.md §4): inject a known
synthetic signal into fMRI volumes, train WITHOUT the GLM regularizer, and
verify the recovered `task` covariate map concentrates on the injected
voxels.

Runs the real pipeline end-to-end: subject tree -> add_signal CLI ->
preproc CLI -> Trainer (on whatever jax backend is active; a TPU chip runs
300 epochs of the toy in well under a minute of device time) -> per-volume
reconstruction -> averaged maps -> quantitative check.

Usage:
  python -m vaegam_tpu.tools.control_experiment --work_dir /tmp/ctl \
      --epochs 300 --intensity 400

Prints a JSON line with the recovery metrics and exits nonzero on failure.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import time

import numpy as np
import pandas as pd


MOTION_COLS = ["trans_x", "trans_y", "trans_z", "rot_x", "rot_y", "rot_z"]


def _scale_coords(coords, img_shape, ref=(41, 49, 35)):
    f = [s / r for s, r in zip(img_shape, ref)]
    return [tuple(int(round(c * fi)) for c, fi in zip(co, f))
            for co in coords]


def build_motion_maps(img_shape=(41, 49, 35)):
    """Six disjoint octahedral ground-truth maps, one per motion covariate.

    Anchor corners scale proportionally on non-reference grids (the MNI
    oracle arm, BASELINE configs[4])."""
    from ..utils.stats import mk_spherical_mask

    ball = mk_spherical_mask(size=7, radius=1)
    coords = _scale_coords([(5, 6, 5), (30, 8, 8), (8, 36, 8),
                            (30, 36, 10), (8, 8, 25), (28, 36, 24)],
                           img_shape)
    maps = np.zeros((6,) + tuple(img_shape), np.float32)
    for c, (x, y, z) in enumerate(coords):
        maps[c, x:x + 7, y:y + 7, z:z + 7] += ball
    return maps


def build_sex_map(img_shape=(41, 49, 35)):
    """Octahedral ground-truth map for the (binary, un-z-scored) sex cov."""
    from ..utils.stats import mk_spherical_mask

    ball = mk_spherical_mask(size=7, radius=1)
    maps = np.zeros(tuple(img_shape), np.float32)
    (x, y, z), = _scale_coords([(16, 20, 22)], img_shape)
    maps[x:x + 7, y:y + 7, z:z + 7] += ball
    return maps


def build_fake_subjects(root, n_subjs, n_vols, seed=0,
                        motion_artifact_intensity=0.0,
                        sex_effect_intensity=0.0,
                        noise_sigma=15.0,
                        anatomy_var=1.0,
                        img_shape=(41, 49, 35)):
    """Realistic-ish toy: smooth random 'anatomy' + noise, full (41,49,35).

    motion_artifact_intensity > 0 additionally injects motion-correlated
    artifacts sum_c z_c(t) * intensity * M_c with known octahedral maps M_c
    (z_c = the covariate exactly as the model will see it, i.e. globally
    population-z-scored like cli/preproc).  This gives the 6 motion
    covariates non-zero ground-truth beta maps — real fMRI has motion
    artifacts, and all-zero motion GLM targets push the sigmoid decoder
    into an exactly-zero dead zone (docs/CONTROL_EXPERIMENT.md, the r1
    multi-subject failure mode).  Returns the (6, *img_shape) maps (or
    None when intensity is 0).

    anatomy_var in [0, 1] mixes a SHARED template field with per-subject
    fields: field_s = (1-v)*template + v*independent_s.  The reference's
    operative data is fmriprep template-space resampled
    (pre_proc_vaefmri.py:81-88 globs *brainmasked_resampled*), where
    inter-subject anatomy is highly aligned — v=1 (every subject a fully
    independent random field) is far HARDER than real data for a shared
    decoder and is kept only for continuity with the recorded N<=3 gates.
    """
    from ..utils import nifti

    from scipy import ndimage

    rng = np.random.default_rng(seed)

    # smoothing length scales with the grid so "anatomy" has the same
    # relative feature size on every volume geometry
    sig_vox = 4.0 * (sum(img_shape) / (41 + 49 + 35))

    def smooth_field(r):
        f = ndimage.gaussian_filter(r.normal(size=img_shape), sigma=sig_vox)
        return (f - f.min()) / (f.max() - f.min())

    # template from its own stream: anatomy_var=1 runs reproduce the
    # recorded N<=3 gate data bit-for-bit (main rng stream untouched)
    template = smooth_field(np.random.default_rng(seed + 10_000))
    subj_ids, vols_all, mot_all = [], [], []
    for s in range(n_subjs):
        subj = f"sub-A000{70 + s:02d}"
        subj_ids.append(subj)
        os.makedirs(os.path.join(root, subj), exist_ok=True)
        # smooth random field = representable "anatomy" (white noise is not
        # expressible by a conv decoder and would bury the injected signal)
        field = ((1.0 - anatomy_var) * template
                 + anatomy_var * smooth_field(rng))
        base = (300 + 2500 * field).astype(np.float32)
        vols = np.stack(
            [base + rng.normal(0, noise_sigma, img_shape)
             for _ in range(n_vols)],
            axis=-1,
        ).astype(np.float32)
        if sex_effect_intensity > 0 and s % 2 == 1:
            # sex is a constant un-z-scored 0/1 covariate (utils.zscore only
            # standardizes the 6 motion columns); subjects with sex=1 carry
            # a constant anatomical effect at a known octahedral map
            vols += (sex_effect_intensity
                     * build_sex_map(img_shape))[..., None]
        mot = pd.DataFrame(
            {c: rng.normal(0, 0.4, n_vols) for c in MOTION_COLS}
        )
        vols_all.append(vols)
        mot_all.append(mot)

    motion_maps = None
    if motion_artifact_intensity > 0:
        motion_maps = build_motion_maps(img_shape)
        # population z-score over ALL subjects' rows (utils.zscore semantics,
        # ddof=0) — the injected effect is per unit of the covariate the
        # model actually receives
        allmot = pd.concat(mot_all, ignore_index=True)
        mean, std = allmot.mean(axis=0), allmot.std(axis=0, ddof=0)
        for s in range(n_subjs):
            z = ((mot_all[s] - mean) / std).to_numpy()  # (n_vols, 6)
            art = np.einsum(
                "tc,cxyz->xyzt", z.astype(np.float32),
                motion_artifact_intensity * motion_maps,
            )
            vols_all[s] += art

    for s, subj in enumerate(subj_ids):
        sdir = os.path.join(root, subj)
        nifti.save(
            nifti.Nifti1Image(vols_all[s], np.diag([3.0, 3.0, 3.0, 1.0])),
            os.path.join(
                sdir, f"{subj}_preproc_bold_brainmasked_resampled.nii.gz"
            ),
        )
        mot_all[s].to_csv(
            os.path.join(
                sdir,
                f"{subj}_task-CHECKERBOARD_acq-1400_desc-confounds_"
                "regressors_toy.tsv",
            ),
            sep="\t", index=False,
        )
    pd.DataFrame(
        {"subjID": subj_ids, "gender ": [i % 2 for i in range(n_subjs)]}
    ).to_csv(os.path.join(root, "sex_info.csv"), index=False)
    return motion_maps


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--work_dir", type=str, required=True)
    parser.add_argument("--epochs", type=int, default=300)
    parser.add_argument("--n_vols", type=int, default=98)
    parser.add_argument("--n_subjs", type=int, default=1)
    parser.add_argument("--intensity", type=float, default=1000.0)
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--seed", type=int, default=1)
    parser.add_argument("--qu_s_cholesky", action="store_true", default=True,
                        help="Use the PSD qu_S parameterization (default on: "
                        "the reference's raw parameterization diverges on "
                        "this toy around epoch ~16, its known instability).")
    parser.add_argument("--no-qu_s_cholesky", dest="qu_s_cholesky",
                        action="store_false")
    parser.add_argument("--glm_reg", action="store_true", default=True,
                        help="Exercise the GLM regularizer (configs[1]): "
                        "build ground-truth beta maps for the injected "
                        "signal and train with glm_reg_scale=1.  DEFAULT ON: "
                        "this variant is PRNG-stream-robust (contrast ~3000) "
                        "and is the pass/fail gate; the no-reg variant "
                        "(--no-glm_reg, the reference's control setup) is "
                        "weakly identified and seed-sensitive — reported, "
                        "not gated.")
    parser.add_argument("--no-glm_reg", dest="glm_reg", action="store_false")
    parser.add_argument("--bf16_convs", action="store_true", default=False,
                        help="Run the conv stacks with bfloat16 activations "
                        "(the VERDICT r1 #5 recipe study variant).")
    parser.add_argument("--half_recipe", type=str, default="",
                        choices=["", "off", "full", "encoder", "decoder",
                                 "fp32_final"],
                        help="Per-stack bf16 recipe arm (VERDICT r3 Next "
                        "#2): full = both conv stacks bf16 (same as "
                        "--bf16_convs); encoder = bf16 encoder + fp32 "
                        "decoder; decoder = fp32 encoder + bf16 decoder; "
                        "fp32_final = both stacks bf16 except the "
                        "sigmoid-feeding convt5.  Overrides --bf16_convs.")
    parser.add_argument("--bf16_warmstart", type=int, default=0,
                        help="Train the first N epochs with fp32 convs, then "
                        "switch to bfloat16 for the rest (multi-subject bf16 "
                        "rescue arm: the collapse happens in EARLY training "
                        "near the gain-collapse boundary; once sa_task is "
                        "established, bf16 rounding may no longer tip it).")
    parser.add_argument("--fused_norm_stats", action="store_true",
                        default=True,
                        help="Joint decoder norm statistics over all 9B "
                        "fused-decode rows instead of the reference's "
                        "per-one-hot stats.  DEFAULT ON for the oracle: "
                        "measured markedly more stable on this toy (300ep "
                        "glm_reg contrast 330 vs total collapse with the "
                        "reference's per-one-hot stats; see "
                        "docs/CONTROL_EXPERIMENT.md).")
    parser.add_argument("--reference_norm_stats", dest="fused_norm_stats",
                        action="store_false",
                        help="Use the reference's per-one-hot decoder norm "
                        "statistics (the 1e-3-parity semantics).")
    parser.add_argument("--glm_reg_scale", type=float, default=None,
                        help="Weight of the GLM regularizer term.  Default: "
                        "1 (the reference default) for single-subject, 10 "
                        "for multi-subject — with multiple anatomies the "
                        "latent can absorb the task bump via base(z), and "
                        "the log-likelihood then drives the task gain to "
                        "zero unless the regularizer pull is stronger "
                        "(measured: sa_task 0.047 at scale 1, see "
                        "docs/CONTROL_EXPERIMENT.md).")
    parser.add_argument("--sex_effect", type=float, default=None,
                        help="Constant anatomical effect at a known "
                        "octahedral map in sex=1 subjects (the binary sex "
                        "covariate then has a non-zero ground-truth beta "
                        "map).  Default: 200 for the realistic tier "
                        "(n_subjs >= 10), 0 otherwise.")
    parser.add_argument("--anatomy_var", type=float, default=None,
                        help="Inter-subject anatomy variation in [0,1]: "
                        "field_s = (1-v)*shared_template + v*independent_s. "
                        "Default: 0.3 for the realistic tier (n_subjs >= "
                        "10), modeling fmriprep template-space alignment "
                        "(the reference's operative data, "
                        "pre_proc_vaefmri.py:81-88); 1.0 otherwise "
                        "(continuity with the recorded N<=3 gates).")
    parser.add_argument("--noise_sigma", type=float, default=15.0,
                        help="Per-volume Gaussian noise sigma (raw intensity "
                        "units; anatomy spans 300-2800).  The realistic "
                        "tier uses larger values to model real fMRI SNR.")
    parser.add_argument("--max_skips", type=int, default=-1,
                        help="Regression bound on non-finite-skipped steps "
                        "(VERDICT r4 Weak #4): if >= 0, the run FAILS when "
                        "more than this many optimizer steps were skipped "
                        "non-finite, even if the map recovered.  Gate arms "
                        "pin the measured bound; default -1 = report only.")
    parser.add_argument("--no_gate", action="store_true", default=False,
                        help="Report metrics but always exit 0 — for "
                        "tracked non-gating arms (e.g. the "
                        "reference-parity-semantics trainability arm, "
                        "VERDICT r2 Weak #4).")
    parser.add_argument("--reuse_data", action="store_true", default=False,
                        help="Skip subject generation + signal injection + "
                        "preproc when work_dir already holds the CSV from a "
                        "previous run with the SAME data knobs (n_subjs, "
                        "n_vols, intensity, motion_artifacts, sex_effect, "
                        "noise_sigma) — for sweeps over training knobs "
                        "(epochs, scales, dtypes) only.")
    parser.add_argument("--run_name", type=str, default="run",
                        help="Subdirectory of work_dir for this run's "
                        "outputs (checkpoints, recons); lets sweep arms "
                        "share one work_dir/data without clobbering.")
    parser.add_argument("--img_shape", type=int, nargs=3,
                        default=[41, 49, 35],
                        help="Volume grid (D H W).  The MNI oracle arm "
                        "(BASELINE configs[4]) uses 91 109 91; signal/"
                        "artifact placements scale proportionally "
                        "(add_signal.scaled_sphere_params / _scale_coords). "
                        "Default: the reference grid.")
    parser.add_argument("--cache_dtype", type=str, default="auto",
                        help="HBM device-cache dtype (auto/float32/bfloat16/"
                        "float16) — part of the recipe under study.")
    parser.add_argument("--epoch_scan", action="store_true", default=False,
                        help="Fuse each epoch's uniform-size steps into one "
                             "lax.scan dispatch (Trainer epoch_scan knob; "
                             "recipe study arm — see docs/PERFORMANCE.md).")
    parser.add_argument("--motion_artifacts", type=float, default=None,
                        help="Inject motion-correlated artifacts with known "
                        "octahedral maps at this intensity (gives the 6 "
                        "motion covariates non-zero GLM targets).  Default: "
                        "150 for multi-subject runs (the r1 dead-zone fix), "
                        "0 for single-subject.")
    args = parser.parse_args(argv)

    from ..cli import add_signal, preproc
    from ..cli.add_signal import build_control_signal
    from ..data import setup_device_loaders
    from ..models import VAEGAMConfig
    from ..outputs import mk_avg_maps, mk_single_volumes
    from ..train import Trainer
    from ..utils import nifti
    from ..utils.stats import get_xu_ranges

    img_shape = tuple(args.img_shape)
    data_dir = os.path.join(args.work_dir, "data")
    os.makedirs(data_dir, exist_ok=True)
    if args.motion_artifacts is None:
        args.motion_artifacts = 150.0 if args.n_subjs > 1 else 0.0
    if args.glm_reg_scale is None:
        args.glm_reg_scale = 10.0 if args.n_subjs > 1 else 1.0
    if args.sex_effect is None:
        args.sex_effect = 200.0 if args.n_subjs >= 10 else 0.0
    if args.anatomy_var is None:
        args.anatomy_var = 0.3 if args.n_subjs >= 10 else 1.0
    # newest by mtime: the %m_%d_%Y date embedded in the filename does NOT
    # sort chronologically as a string (12_31_2025 > 01_15_2026)
    existing_csv = sorted(
        glob.glob(os.path.join(args.work_dir, "preproc_dset_zscored_*.csv")),
        key=os.path.getmtime,
    )
    if args.reuse_data and existing_csv:
        t0 = time.time()
        csv = existing_csv[-1]
        motion_maps = (build_motion_maps(img_shape)
                       if args.motion_artifacts > 0 else None)
        print(f"[reuse_data] using {csv}")
    else:
        motion_maps = build_fake_subjects(
            data_dir, args.n_subjs, args.n_vols, seed=0,
            motion_artifact_intensity=args.motion_artifacts,
            sex_effect_intensity=args.sex_effect,
            noise_sigma=args.noise_sigma,
            anatomy_var=args.anatomy_var,
            img_shape=img_shape,
        )

        t0 = time.time()
        add_signal.main(
            ["--root_dir", data_dir, "--intensity", str(args.intensity),
             "--shape", "simple",
             "--img_shape", *[str(i) for i in img_shape]]
        )
        csv = preproc.main(
            ["--data_dir", data_dir, "--save_dir", args.work_dir, "--control",
             "--control_int", str(int(args.intensity)), "--set_tag", "TRAIN",
             "--nii_file_pattern", "*_ALTERED_simple_*.nii.gz",
             "--sex_info", os.path.join(data_dir, "sex_info.csv"),
             "--mot_file_pattern",
             "sub-A000*_desc-confounds_regressors_*.tsv"]
        )

    run_dir = os.path.join(args.work_dir, args.run_name)
    glm_maps = None
    glm_reg_scale = 0.0
    if args.glm_reg:
        # ground-truth beta maps for the toy: task map = scaled injected
        # signal, motion maps = scaled injected artifacts (or 0), sex map =
        # 0 (csv read WITH index col -> 9 columns, matching
        # vae_reg_GP.py:58-59 semantics)
        sig = build_control_signal(
            "simple", args.intensity, 1, 7, img_shape=img_shape) / 3284.5
        glm_maps = np.zeros((sig.size, 9), np.float32)
        glm_maps[:, 1] = sig.reshape(-1)
        if motion_maps is not None:
            for c in range(6):
                glm_maps[:, 2 + c] = (
                    args.motion_artifacts * motion_maps[c].reshape(-1) / 3284.5
                )
        if args.sex_effect > 0:
            glm_maps[:, 8] = (
                args.sex_effect * build_sex_map(img_shape).reshape(-1)
                / 3284.5
            )
        glm_reg_scale = args.glm_reg_scale
    import jax.numpy as jnp

    warm = min(args.bf16_warmstart, args.epochs) if args.bf16_warmstart else 0
    bf16 = jnp.bfloat16
    recipe = args.half_recipe or ("full" if args.bf16_convs else "off")
    if warm and recipe not in ("off", "full"):
        raise SystemExit("--bf16_warmstart only composes with whole-stack "
                         "recipes (set_conv_dtype switches conv_dtype only)")
    stack_kw = {
        "off": dict(conv_dtype=None),
        "full": dict(conv_dtype=None if warm else bf16),
        "encoder": dict(conv_dtype=None,
                        enc_conv_dtype=None if warm else bf16),
        "decoder": dict(conv_dtype=None,
                        dec_conv_dtype=None if warm else bf16),
        "fp32_final": dict(conv_dtype=None if warm else bf16,
                           dec_fp32_final=True),
    }[recipe]
    config = VAEGAMConfig(glm_reg_scale=glm_reg_scale,
                          neural_covariates=False,
                          img_shape=img_shape,
                          qu_s_cholesky=args.qu_s_cholesky,
                          fused_norm_stats=args.fused_norm_stats,
                          **stack_kw)
    loaders = setup_device_loaders(batch_size=args.batch_size, train_csv=csv,
                                   test_csv=csv, seed=args.seed,
                                   cache_dtype=args.cache_dtype)
    trainer = Trainer(config, get_xu_ranges([csv, csv]), glm_maps=glm_maps,
                      save_dir=run_dir, seed=args.seed, enable_tb=False,
                      epoch_scan=args.epoch_scan)
    t_train0 = time.time()
    if warm:
        trainer.train_loop(loaders, epochs=warm, test_freq=None,
                           save_freq=None, save_dir=run_dir)
        print(f"[bf16_warmstart] switching convs to bfloat16 after "
              f"{warm} fp32 epochs")
        trainer.set_conv_dtype(jnp.bfloat16)
    trainer.train_loop(loaders, epochs=args.epochs - warm, test_freq=None,
                       save_freq=None, save_dir=run_dir)
    train_secs = time.time() - t_train0
    trainer.save_state(os.path.join(run_dir, "final.tar"))  # for diagnosis

    mk_single_volumes(loaders["UnShuffled_train"], trainer, csv, run_dir)
    mk_avg_maps(csv, trainer, run_dir,
                mk_motion_maps=args.motion_artifacts > 0)

    # --- recovery check ------------------------------------------------------
    ckpt = str(trainer.epoch).zfill(3)
    task_avgs = glob.glob(
        os.path.join(run_dir, "reconstructions", f"{ckpt}_avg_model_recons",
                     "task_avg.nii")
    )
    task_map = np.array(nifti.load(task_avgs[0]).dataobj)
    mask = build_control_signal("simple", 1.0, 1, 7, img_shape=img_shape) > 0

    inside = float(np.mean(np.abs(task_map[mask])))
    outside = float(np.mean(np.abs(task_map[~mask])))
    contrast = inside / max(outside, 1e-12)
    # also check against scaled ground truth: injected/3284.5
    expected = args.intensity / 3284.5
    inside_mean = float(np.mean(task_map[mask]))

    vols_per_sec = args.epochs * args.n_vols * args.n_subjs / train_secs

    # optional recovery metrics for the other signal-carrying covariates
    # (the realistic tier injects task + motion + sex; VERDICT r2 Next #4)
    extra = {}
    avg_dir = os.path.join(run_dir, "reconstructions",
                           f"{ckpt}_avg_model_recons")
    if args.sex_effect > 0 and args.n_subjs >= 2:
        # sex is constant per subject: use a sex=1 subject's average
        # (grand-averaging over both sexes halves the effect); subjects
        # alternate sex, so a sex=1 subject only exists at n_subjs >= 2
        sex_subj = f"sub-A000{70 + 1:02d}"
        sex_map = np.array(nifti.load(
            os.path.join(avg_dir, sex_subj, "sex_avg.nii")).dataobj)
        smask = build_sex_map(img_shape) > 0
        s_in = float(np.mean(sex_map[smask]))
        s_out = float(np.mean(np.abs(sex_map[~smask])))
        extra.update(sex_map_mean_inside=round(s_in, 4),
                     sex_expected=round(args.sex_effect / 3284.5, 4),
                     sex_contrast=round(s_in / max(s_out, 1e-12), 2))
    if args.motion_artifacts > 0:
        # zero-mean covariates cancel in time averages, so measure the
        # mean |per-volume| x-motion contribution of one subject instead
        subj = f"sub-A000{70:02d}"
        subj_dir = os.path.join(run_dir, "reconstructions",
                                f"{ckpt}_model_recons", subj)
        acc = None
        vol_dirs = sorted(os.listdir(subj_dir))
        for vd in vol_dirs:
            vol = np.abs(np.array(nifti.load(
                os.path.join(subj_dir, vd, "recon_x_mot.nii")).dataobj))
            acc = vol if acc is None else acc + vol
        acc /= len(vol_dirs)
        mmask = build_motion_maps(img_shape)[0] > 0
        m_in = float(np.mean(acc[mmask]))
        m_out = float(np.mean(acc[~mmask]))
        extra.update(xmot_absmap_mean_inside=round(m_in, 4),
                     xmot_contrast=round(m_in / max(m_out, 1e-12), 2))
    skips = 0
    if trainer.skip_nonfinite_updates:
        skips = int(np.asarray(trainer.opt_state.total_notfinite))
    # NOTE on thresholds: without the GLM regularizer the base/effect
    # decomposition is only weakly identified — past ~500 epochs the latent
    # z starts absorbing the block signal and the task map collapses (the
    # same dynamic exists in the reference, whose control runs use the
    # 300-epoch default).  The oracle therefore targets the reference's
    # operative regime: clear above-background contrast at ~300 epochs.
    result = {
        "n_subjs": args.n_subjs,
        "img_shape": list(img_shape),
        "batch_size": args.batch_size,
        "cache_dtype": args.cache_dtype,
        "motion_artifacts": args.motion_artifacts,
        "anatomy_var": args.anatomy_var,
        "glm_reg_scale": glm_reg_scale,
        "epochs": args.epochs,
        "conv_dtype": ("float32" if recipe == "off" and not warm
                       else recipe if recipe != "full" else "bfloat16"),
        "half_recipe": recipe,
        "bf16_warmstart": warm,
        "epoch_scan": args.epoch_scan,
        "train_seconds": round(train_secs, 1),
        "train_vols_per_sec": round(vols_per_sec, 1),
        "task_map_mean_inside": round(inside_mean, 4),
        "expected_scaled_signal": round(expected, 4),
        "abs_inside": round(inside, 4),
        "abs_outside": round(outside, 5),
        "contrast_ratio": round(contrast, 2),
        "nonfinite_skips": skips,
        # fallback-jitter engagements of the gain-covariance Cholesky
        # (mvn_sample_safe): a persistent-fallback regime biases gains and
        # must be visible per run (VERDICT r4 Weak #6)
        "mvn_fallbacks": trainer.mvn_fallbacks,
        "recovered": bool(contrast > 2.0 and inside_mean > 0.25 * expected),
        "total_seconds": round(time.time() - t0, 1),
        **extra,
    }
    # epoch-rate stability (the r4 epoch_scan incident was invisible in the
    # summary JSON): baseline = median of epochs 5..19, degradation = worst
    # later epoch over baseline.  A healthy run sits near 1.0.
    eps = [trainer.epoch_seconds[k] for k in sorted(trainer.epoch_seconds)]
    if len(eps) >= 25:
        ep_base = float(np.median(eps[5:20]))
        ep_max = float(np.max(eps[5:]))
        result["epoch_s_baseline"] = round(ep_base, 3)
        result["epoch_s_max"] = round(ep_max, 3)
        result["epoch_s_degradation"] = round(ep_max / ep_base, 2)
        # count of >=2x-baseline epochs + the full series on disk: a
        # transient spike (tunnel/host interference) and a sustained
        # degradation look identical in a max — the series disambiguates
        result["epoch_s_over2x"] = int(np.sum(np.asarray(eps[5:])
                                              > 2 * ep_base))
        with open(os.path.join(run_dir, "epoch_seconds.json"), "w") as f:
            json.dump([round(e, 3) for e in eps], f)
    if args.max_skips >= 0:
        result["max_skips"] = args.max_skips
        result["skips_ok"] = bool(skips <= args.max_skips)
    print(json.dumps(result))
    if args.no_gate:
        return 0
    if args.max_skips >= 0 and not result["skips_ok"]:
        return 1
    return 0 if result["recovered"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
