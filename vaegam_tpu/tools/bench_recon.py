"""Output-stage (reconstruction) bench: eval batch width sweep.

The reference reuses the training loader for reconstruction
(vae_reg_GP.py:585-594, batch 32 by default), which leaves the encoder
MXU-starved at small B during the output stage.  ``wide_eval_view``
(--eval_batch_size) widens the unshuffled eval loader; this tool records
what that buys on real hardware, separating

  * maps-forward-only throughput (device compute: encoder + 9-wide decode
    + gains, no host writes), and
  * full mk_single_volumes wall-clock (device compute overlapped with the
    async NIfTI writer pool — the host-I/O-bound regime).

Usage:  python -m vaegam_tpu.tools.bench_recon [--n_subjs 2] [--n_vols 98]
        [--widths 32 128 256]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import tempfile
import time

import numpy as np
import pandas as pd


def build_dataset(root: str, n_subjs: int, n_vols: int, img=(41, 49, 35)):
    """Synthetic subjects on the reference grid + the CSV contract."""
    from ..utils import nifti

    rng = np.random.default_rng(0)
    rows = []
    for s in range(n_subjs):
        subj = f"sub-A000{60 + s:02d}"
        vols = rng.uniform(0, 3284.5, size=img + (n_vols,)).astype(np.float32)
        path = os.path.join(root, f"{subj}.nii")
        nifti.save(
            nifti.Nifti1Image(vols, np.diag([2.0, 2.0, 2.0, 1.0])), path
        )
        for t in range(n_vols):
            rows.append({
                "subjid": subj, "volume #": t, "nii_path": path,
                "task": float(t % 2), "x": rng.normal(), "y": rng.normal(),
                "z": rng.normal(), "rot_x": rng.normal(),
                "rot_y": rng.normal(), "rot_z": rng.normal(), "sex": s % 2,
            })
    csv = os.path.join(root, "bench_recon.csv")
    pd.DataFrame(rows).to_csv(csv)
    return csv


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n_subjs", type=int, default=2)
    p.add_argument("--n_vols", type=int, default=98)
    p.add_argument("--widths", type=int, nargs="+", default=[32, 128, 256])
    p.add_argument("--nf", type=int, default=8,
                   help="encoder feature width (reference default 8); "
                        "small values for CPU smoke tests")
    p.add_argument("--num_latents", type=int, default=32)
    p.add_argument("--recon_wire_dtype", choices=["float32", "float16"],
                   default="float32",
                   help="device->host map wire precision (see cli/train)")
    p.add_argument("--img_shape", type=int, nargs=3,
                   default=[41, 49, 35], metavar=("D", "H", "W"),
                   help="volume grid (e.g. 91 109 91 for MNI scale)")
    args = p.parse_args(argv)

    import jax

    # honor JAX_PLATFORMS even though this env's sitecustomize pre-imports
    # jax on the axon platform (env vars are too late; config is
    # authoritative — same fix as tests/conftest.py)
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from ..data import DeviceResidentLoader, FMRIDataset, wide_eval_view
    from ..models import VAEGAMConfig
    from ..outputs.recons import mk_single_volumes
    from ..train import Trainer

    img_shape = tuple(args.img_shape)
    root = tempfile.mkdtemp(prefix="bench_recon_")
    csv = build_dataset(root, args.n_subjs, args.n_vols, img=img_shape)
    ds = FMRIDataset(csv)
    n = len(ds)

    config = VAEGAMConfig(nf=args.nf, num_latents=args.num_latents,
                          img_shape=img_shape)
    img_dim = config.img_dim
    trainer = Trainer(config, [[-2.0, 2.0]] * 6, glm_maps=None,
                      seed=1, enable_tb=False,
                      recon_wire_dtype=args.recon_wire_dtype)
    base = DeviceResidentLoader(ds, batch_size=32, shuffle=False)

    results = {"n_vols_total": n}
    for width in args.widths:
        if width == base.batch_size:
            loader = base
        elif width > base.batch_size:
            loader = wide_eval_view(base, img_dim, width=width)
        else:
            # narrower than the training batch (the MNI b8/b16 regimes):
            # wide_eval_view only widens, so take an exact-width view over
            # the shared HBM cache
            loader = DeviceResidentLoader.sharing_cache(
                base, batch_size=width, shuffle=False)
        eff = loader.batch_size
        # (a) maps forward only — the reconstruct() device loop minus writes
        maps_step = trainer._recon_maps_step()  # applies recon_wire_dtype
        for sample in loader:  # warmup epoch (compile)
            covs, x = trainer._put_batch(sample)
            maps_step(trainer.params, trainer._next_key(), covs, x)
        t0 = time.time()
        last = None
        for sample in loader:
            covs, x = trainer._put_batch(sample)
            _, last = maps_step(
                trainer.params, trainer._next_key(), covs, x
            )
        jax.block_until_ready(last)
        fwd_vps = n / (time.time() - t0)
        # (a2) forward + device->host pull, NO writes — isolates the wire
        # from the writer pool (the r4 MNI output-stage mystery: which of
        # forward / wire / encode+write / avg-maps re-read owns the time)
        t0 = time.time()
        for sample in loader:
            covs, x = trainer._put_batch(sample)
            _, aux = maps_step(trainer.params, trainer._next_key(), covs, x)
            for v in aux["maps"].values():
                np.asarray(v)
        pull_vps = n / (time.time() - t0)
        # (b) full recon stage including the async NIfTI writer pool
        out = os.path.join(root, f"recons_w{eff}")
        os.makedirs(out, exist_ok=True)
        t0 = time.time()
        mk_single_volumes(loader, trainer, csv, out)
        full_vps = n / (time.time() - t0)
        # (c) the averaged-maps stage: re-reads every written per-volume
        # file (reference build_model_recons.py:86-92 semantics)
        from ..outputs.recons import mk_avg_maps

        t0 = time.time()
        mk_avg_maps(csv, trainer, out, mk_motion_maps=True)
        avg_s = time.time() - t0
        shutil.rmtree(out)
        results[f"width_{eff}_fwd_vols_per_s"] = round(fwd_vps, 2)
        results[f"width_{eff}_fwd_pull_vols_per_s"] = round(pull_vps, 2)
        results[f"width_{eff}_full_recon_vols_per_s"] = round(full_vps, 2)
        results[f"width_{eff}_avg_maps_s"] = round(avg_s, 1)
        print(f"width {eff}: fwd {fwd_vps:.2f} | fwd+pull {pull_vps:.2f} | "
              f"full recon {full_vps:.2f} vols/s | avg maps {avg_s:.1f} s")
    print(json.dumps(results))
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
