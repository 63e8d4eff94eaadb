"""Training / reconstruction orchestrator CLI.

Flag-for-flag equivalent of the reference multsubj_reg_run_GP.py (:21-54),
including the hyphenated --batch-size:
  --train_csv --test_csv --save_dir --batch-size --epochs --seed --save_freq
  --test_freq --split --glm_reg_scale --glm_maps --num_inducing_pts
  --gp_kl_scale --from_ckpt --ckpt_path --recons_only --neural_covariates

Framework extensions (all optional, defaults preserve reference behavior):
  --log_figs_every N   log per-batch map/beta figures every N batches
                       (the reference logs EVERY batch; default 0 = off)
  --data_parallel      shard the batch over all visible devices
"""

from __future__ import annotations

import argparse
import os
import time

import jax.numpy as jnp
import pandas as pd

from ..data import setup_data_loaders
from ..models import VAEGAMConfig
from ..outputs import mk_avg_maps, mk_single_volumes, plot_GPs, project_latent
from ..train import Trainer
from ..utils.stats import get_xu_ranges, str2bool


def build_parser():
    parser = argparse.ArgumentParser(description="user args for vae_gam model")
    parser.add_argument("--train_csv", type=str, metavar="N", default="",
                        help="Full path to csv file with train dset to be used by DataClass and loaders. This is created by the pre_proc script.")
    parser.add_argument("--test_csv", type=str, metavar="N", default="",
                        help="Full path to csv file with test dset to be used by DataClass and loaders. This is created by the pre_proc script.")
    parser.add_argument("--save_dir", type=str, metavar="N", default="",
                        help="Dir where model params, latent projection maps, GP plots and reconstruction files are saved to. Default is to save files to current dir.")
    parser.add_argument("--batch-size", type=int, default=32, metavar="N",
                        help="Input batch size for training (default: 32)")
    parser.add_argument("--epochs", type=int, default=300, metavar="N",
                        help="Number of epochs to train (default: 300)")
    parser.add_argument("--seed", type=int, default=1, metavar="S",
                        help="Random seed (default: 1)")
    parser.add_argument("--save_freq", type=int, default=100, metavar="N",
                        help="How many epochs to wait before saving training status.")
    parser.add_argument("--test_freq", type=int, default=200, metavar="N",
                        help="How many epochs to wait before testing.")
    parser.add_argument("--split", type=int, metavar="N", default=98,
                        help="Number used to change colors when plotting VAE latent projection. This is # of volumes for each subj -- i.e., color scheme is per subj.")
    parser.add_argument("--glm_reg_scale", type=float, metavar="N", default=1.0,
                        help="Scaling factor for GLM map regularization term (default: 1)")
    parser.add_argument("--glm_maps", type=str, metavar="N", default="",
                        help="Path to csv file containing matrix with approximate GLM maps, one per covariate.")
    parser.add_argument("--num_inducing_pts", type=int, metavar="N", default=6,
                        help="Number of inducing points for each regressor 1D GP.")
    parser.add_argument("--gp_kl_scale", type=float, metavar="N", default=10.0,
                        help="Scaling factor for KL divergence loss terms coming from linear and non-linear (GP) pieces of gamma.")
    parser.add_argument("--from_ckpt", type=str2bool, nargs="?", const=True,
                        default=False,
                        help="Boolean flag indicating if training and/or reconstruction should be carried using a pre-trained model state.")
    parser.add_argument("--ckpt_path", type=str, metavar="N", default="",
                        help="Path to ckpt with saved model state to be loaded. Only effective if --from_ckpt == True.")
    parser.add_argument("--recons_only", type=str2bool, nargs="?", const=True,
                        default=False,
                        help="Boolean flag indicating if trainig is to be skipped.")
    parser.add_argument("--neural_covariates", type=str2bool, nargs="?",
                        const=True, default=True,
                        help="Boolean flag indicating if covariate set includes neural/biological effects which should be convolved with the HRF.")
    # framework extensions
    parser.add_argument("--log_figs_every", type=int, metavar="N", default=0,
                        help="Log per-batch map/beta TB figures every N batches (0 = off; the reference logs every batch).")
    parser.add_argument("--data_parallel", type=str2bool, nargs="?", const=True,
                        default=False,
                        help="Shard batches over all visible devices (1D data mesh).")
    parser.add_argument("--nf", type=int, metavar="N", default=8,
                        help="Conv feature multiplier (reference default 8; exposed for small-scale runs).")
    parser.add_argument("--num_latents", type=int, metavar="N", default=32,
                        help="VAE latent dimension (reference default 32).")
    parser.add_argument("--profile_dir", type=str, metavar="N", default="",
                        help="If set, capture a jax.profiler trace of the first training epochs into this directory.")
    parser.add_argument("--img_shape", type=int, metavar="N", nargs=3,
                        default=[41, 49, 35],
                        help="Volume grid (x y z). Default is the reference's 41 49 35; e.g. 91 109 91 for MNI-grid volumes.")
    parser.add_argument("--multihost", type=str2bool, nargs="?", const=True,
                        default=False,
                        help="Initialize jax.distributed for multi-host training (implies --data_parallel; csv rows are sharded per process).")
    parser.add_argument("--qu_s_cholesky", type=str2bool, nargs="?",
                        const=True, default=False,
                        help="Parameterize each GP posterior covariance as L L^T (always PSD) instead of the reference's raw matrix — fixes the reference's known qu_S instability at the cost of exact-behavior parity.")
    parser.add_argument("--skip_nonfinite_updates", type=str2bool, nargs="?",
                        const=True, default=True,
                        help="Skip optimizer updates whose gradients contain inf/NaN (the regime where the reference crashes); healthy-step numerics unchanged.")
    parser.add_argument("--grad_clip", type=float, metavar="N", default=0.0,
                        help="Global-norm gradient clipping (0 = off).")
    parser.add_argument("--device_data_cache", type=str2bool, nargs="?",
                        const=True, default=True,
                        help="Upload the whole dataset to device HBM once and gather batches on device (falls back to the streaming loader for datasets over 4 GiB).")
    parser.add_argument("--conv_dtype", choices=["float32", "bfloat16"],
                        default="float32",
                        help="Conv-stack activation/compute precision. float32 (default) is the reference-parity path; bfloat16 halves the memory-bound conv traffic (see docs/PERFORMANCE.md for the recovery study).")
    parser.add_argument("--fused_norm_stats", type=str2bool, nargs="?",
                        const=True, default=False,
                        help="Joint decoder batch-norm statistics over the fused 9B decode instead of the reference's per-one-hot statistics. Default off (reference parity; required when reconstructing from imported torch checkpoints). Turning it on is measurably more stable on the synthetic control oracle (docs/CONTROL_EXPERIMENT.md).")
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)

    if args.save_dir == "":
        args.save_dir = os.getcwd()
    if args.save_dir != "" and not os.path.exists(args.save_dir):
        os.makedirs(args.save_dir)

    main_start = time.time()
    shard_index, num_shards = 0, 1
    if args.multihost:
        import jax

        from ..parallel import init_multihost

        init_multihost()
        shard_index, num_shards = jax.process_index(), jax.process_count()
        args.data_parallel = True

    # the mesh must exist BEFORE the loaders: the device cache replicates
    # the dataset over it and constrains batch gathers to P('data')
    mesh = None
    if args.data_parallel:
        from ..parallel import make_data_mesh

        mesh = make_data_mesh()

    loader_kwargs = dict(
        batch_size=args.batch_size, train_csv=args.train_csv,
        test_csv=args.test_csv, seed=args.seed,
        shard_index=shard_index, num_shards=num_shards,
    )
    loaders_dict = None
    if args.device_data_cache:
        from ..data import setup_device_loaders

        try:
            loaders_dict = setup_device_loaders(mesh=mesh, **loader_kwargs)
        except ValueError as e:
            print(f"[device cache disabled] {e} — using the double-buffered "
                  "host->HBM prefetch pipeline")
            from ..data import setup_prefetch_loaders

            loaders_dict = setup_prefetch_loaders(mesh=mesh, **loader_kwargs)
    if loaders_dict is None:
        loaders_dict = setup_data_loaders(**loader_kwargs)

    config = VAEGAMConfig(
        nf=args.nf,
        num_latents=args.num_latents,
        img_shape=tuple(args.img_shape),
        num_inducing_pts=args.num_inducing_pts,
        gp_kl_scale=args.gp_kl_scale,
        glm_reg_scale=args.glm_reg_scale,
        neural_covariates=args.neural_covariates,
        qu_s_cholesky=args.qu_s_cholesky,
        conv_dtype=(jnp.bfloat16 if args.conv_dtype == "bfloat16" else None),
        fused_norm_stats=args.fused_norm_stats,
    )
    glm_maps = None
    if args.glm_maps:
        glm_maps = pd.read_csv(args.glm_maps).to_numpy()
    xu_ranges = get_xu_ranges([args.train_csv, args.test_csv])

    trainer = Trainer(
        config, xu_ranges, glm_maps=glm_maps, save_dir=args.save_dir,
        seed=args.seed, log_figs_every=args.log_figs_every, mesh=mesh,
        skip_nonfinite_updates=args.skip_nonfinite_updates,
        grad_clip=args.grad_clip,
    )

    if args.from_ckpt:
        assert os.path.exists(args.ckpt_path), (
            "Oops, looks like ckpt file given does NOT exist!"
        )
        print("=" * 40)
        print(f"Loading model state from: {args.ckpt_path}")
        trainer.load_state(args.ckpt_path)

    if args.profile_dir:
        import jax

        jax.profiler.start_trace(args.profile_dir)

    if not args.recons_only:
        trainer.train_loop(
            loaders_dict, epochs=args.epochs, test_freq=args.test_freq,
            save_freq=args.save_freq, save_dir=args.save_dir,
        )
        project_latent(trainer, loaders_dict, title="Latent Space plot",
                       split=args.split, save_dir=args.save_dir)
        plot_GPs(trainer, csv_file=args.train_csv, save_dir=args.save_dir)
        mk_single_volumes(loaders_dict["UnShuffled_train"], trainer,
                          args.train_csv, args.save_dir)
        mk_avg_maps(args.train_csv, trainer, args.save_dir,
                    mk_motion_maps=True)
    else:
        assert args.from_ckpt, (
            "To choose recons_only option, --from_ckpt needs to be TRUE."
        )
        project_latent(trainer, loaders_dict, title="Latent Space plot",
                       split=args.split, save_dir=args.save_dir)
        plot_GPs(trainer, csv_file=args.train_csv, save_dir=args.save_dir)
        mk_single_volumes(loaders_dict["UnShuffled_train"], trainer,
                          args.train_csv, args.save_dir)
        mk_avg_maps(args.train_csv, trainer, args.save_dir,
                    mk_motion_maps=True)
    if args.profile_dir:
        import jax

        jax.profiler.stop_trace()

    main_end = time.time()
    print(f"Total model runtime (seconds): {main_end - main_start}")


if __name__ == "__main__":
    main()
