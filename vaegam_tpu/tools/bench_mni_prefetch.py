"""MNI-grid loader bench: synchronous DataLoader vs PrefetchLoader.

BASELINE configs[4]-scale volumes (91x109x91 MNI grid) exceed what the
toy-grid device cache was sized for in multi-subject studies; the r1
fallback was the fully synchronous host path (decode -> stack ->
device_put -> step, serialized), measured at ~37 vols/s on the toy grid.
PrefetchLoader (data/prefetch.py) overlaps those stages with device
compute.  This tool records the MNI-grid end-to-end numbers for
docs/PERFORMANCE.md.

Usage:  python -m vaegam_tpu.tools.bench_mni_prefetch [--n_vols 49]
        [--n_subjs 2] [--batch 8] [--epochs 2]
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile
import time

import numpy as np
import pandas as pd


def build_dataset(root: str, n_subjs: int, n_vols: int, img=(91, 109, 91)):
    """Synthetic MNI-grid subjects + the loader CSV contract (SURVEY.md §1)."""
    from ..utils import nifti

    rng = np.random.default_rng(0)
    rows = []
    for s in range(n_subjs):
        subj = f"sub-A000{80 + s:02d}"
        vols = rng.uniform(0, 3284.5, size=img + (n_vols,)).astype(np.float32)
        path = os.path.join(root, f"{subj}.nii")  # uncompressed: decode-bound,
        nifti.save(                               # not gunzip-bound
            nifti.Nifti1Image(vols, np.diag([2.0, 2.0, 2.0, 1.0])), path
        )
        for t in range(n_vols):
            rows.append(
                [subj, t, path, t % 2, *rng.normal(size=6), s % 2]
            )
    df = pd.DataFrame(
        rows, columns=["subjid", "volume #", "nii_path", "task",
                       "x", "y", "z", "rot_x", "rot_y", "rot_z", "sex"]
    )
    csv = os.path.join(root, "mni_train.csv")
    df.to_csv(csv)
    return csv


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n_subjs", type=int, default=2)
    p.add_argument("--n_vols", type=int, default=49)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--depth", type=int, default=3)
    args = p.parse_args(argv)

    import jax

    # honor JAX_PLATFORMS even though this env's sitecustomize pre-imports
    # jax on the axon platform (env vars are too late; config is
    # authoritative — same fix as tests/conftest.py)
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from ..data import (DataLoader, DeviceResidentLoader, FMRIDataset,
                        PrefetchLoader)
    from ..models import VAEGAMConfig
    from ..train import Trainer

    root = tempfile.mkdtemp(prefix="mni_bench_")
    csv = build_dataset(root, args.n_subjs, args.n_vols)
    ds = FMRIDataset(csv)
    n = len(ds)

    config = VAEGAMConfig(img_shape=(91, 109, 91), conv_dtype=None)
    trainer = Trainer(config, [[-2.0, 2.0]] * 6, glm_maps=None,
                      seed=1, enable_tb=False)

    results = {"img_shape": [91, 109, 91], "batch": args.batch,
               "n_vols_total": n}
    candidates = [
        ("sync_DataLoader",
         lambda: DataLoader(ds, batch_size=args.batch, shuffle=True, seed=3)),
        (f"PrefetchLoader(depth={args.depth})",
         lambda: PrefetchLoader(ds, batch_size=args.batch, shuffle=True,
                                seed=3, depth=args.depth)),
        # r3: bfloat16 wire precision — halves the bytes over the binding
        # host->device link (fp32 restored on device)
        (f"PrefetchLoader(depth={args.depth},bf16_wire)",
         lambda: PrefetchLoader(ds, batch_size=args.batch, shuffle=True,
                                seed=3, depth=args.depth,
                                transfer_dtype="bfloat16")),
        # device HBM caches (dataset permitting): fp32 vs the r3 bf16 cache
        # (half the HBM footprint AND half the one-time upload bytes)
        ("DeviceResidentLoader(fp32)",
         lambda: DeviceResidentLoader(ds, batch_size=args.batch,
                                      shuffle=True, seed=3)),
        ("DeviceResidentLoader(bf16_cache)",
         lambda: DeviceResidentLoader(ds, batch_size=args.batch,
                                      shuffle=True, seed=3,
                                      cache_dtype="bfloat16")),
    ]
    for name, make in candidates:
        try:
            t_up0 = time.time()
            loader = make()
            jax.block_until_ready(getattr(loader, "_vols", ()))
            upload = time.time() - t_up0
            if hasattr(loader, "_vols"):
                results[f"{name}_upload_s"] = round(upload, 2)
        except ValueError as e:  # over the HBM cache budget
            results[name] = f"skipped: {e}"
            continue
        trainer.train_epoch(loader)  # warmup epoch (compile + host caches)
        t0 = time.time()
        for _ in range(args.epochs):
            trainer.train_epoch(loader)
        jax.block_until_ready(trainer.params)
        dt = time.time() - t0
        vps = args.epochs * n / dt
        results[name] = round(vps, 2)
        print(f"{name}: {vps:.2f} vols/s e2e")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
