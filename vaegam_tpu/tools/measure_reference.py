"""Measure the PyTorch reference's CPU training throughput (BASELINE.md).

The reference publishes no numbers, so the bench denominator is measured:
run the actual /root/reference train loop on a synthetic control-sized toy
(1 subject, 98 volumes, 41x49x35) and time epochs.

Two variants are recorded (VERDICT round-1 item #10):
  * as-is:       the reference exactly as shipped, including its per-batch
                 TensorBoard figure rendering (vae_reg_GP.py:333-337,372,
                 384-398) — SURVEY.md flags that logging as its biggest
                 self-inflicted slowdown, but it IS the shipped behavior;
  * figures-off: utils.log_map / utils.log_beta stubbed to no-ops, so the
                 number isolates compute+data (the defensible denominator
                 for compute-ratio claims).

Writes/updates baseline_measured.json next to bench.py.

Usage:  python -m vaegam_tpu.tools.measure_reference [--epochs 2] [--variant both]
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import sys
import time
import types

REF = "/root/reference"


def _shim_reference_deps():
    """Stub the reference's module-scope deps that are absent in this env."""
    for name in ("nibabel", "umap"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    if not hasattr(sys.modules["umap"], "UMAP"):
        sys.modules["umap"].UMAP = object
    tv = types.ModuleType("torchvision")
    tv.datasets = types.SimpleNamespace()
    tv.transforms = types.SimpleNamespace()
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.datasets", tv.datasets)


def measure(epochs: int = 2, figures_off: bool = False,
            n_vols: int = 98, batch: int = 32) -> float:
    """Returns reference vols/sec on CPU for the toy workload."""
    import numpy as np
    import pandas as pd
    import torch

    _shim_reference_deps()
    sys.path.insert(0, REF)
    import gp as ref_gp
    import utils as ref_utils
    import vae_reg_GP as ref_vae

    # the documented one-line CPU patch (gp.py:115 hard-calls .cuda())
    def _striped_cpu(n):
        idx = torch.arange(n, dtype=torch.float32)
        return (idx[:, None] - idx[None, :]).abs()

    ref_gp._striped_matrix = _striped_cpu

    if figures_off:
        ref_utils.log_map = lambda *a, **k: None
        ref_utils.log_beta = lambda *a, **k: None

    import tempfile

    d = tempfile.mkdtemp(prefix="refbench_")
    cols = ["x", "y", "z", "rot_x", "rot_y", "rot_z"]
    rng = np.random.default_rng(0)
    df = pd.DataFrame({c: rng.normal(0, 1, n_vols) for c in cols})
    df.insert(0, "subjid", "sub-A00001")
    csv = os.path.join(d, "train.csv")
    df.to_csv(csv)
    glm = os.path.join(d, "glm.csv")
    pd.DataFrame(
        rng.normal(size=(70315, 8)).astype(np.float32),
        columns=["task", "x", "y", "z", "xrot", "yrot", "zrot", "sex"],
    ).to_csv(glm)

    torch.manual_seed(1)
    model = ref_vae.VAE(save_dir=os.path.join(d, "out"), glm_maps=glm,
                        csv_files=[csv, csv], glm_reg_scale=0.0,
                        neural_covariates=False)

    # synthetic loader matching the reference's batch contract
    class _Loader:
        dataset = list(range(n_vols))

        def __iter__(self):
            g = np.random.default_rng(7)
            for start in range(0, n_vols, batch):
                b = min(batch, n_vols - start)
                yield {
                    "volume": torch.tensor(
                        g.uniform(0, 1, size=(b, 41, 49, 35)).astype(np.float32)
                    ),
                    "covariates": torch.tensor(
                        g.normal(0, 1, size=(b, 8)).astype(np.float32)
                    ),
                    "subjid": torch.zeros(b, dtype=torch.int64),
                }

    loader = _Loader()
    model.train_epoch(loader)  # warmup
    t0 = time.time()
    for _ in range(epochs):
        model.train_epoch(loader)
    dt = time.time() - t0
    return epochs * n_vols / dt


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--variant", choices=["asis", "figures_off", "both"],
                   default="figures_off")
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "..", "baseline_measured.json"))
    args = p.parse_args(argv)

    out = os.path.abspath(args.out)
    rec = {}
    if os.path.exists(out):
        with open(out) as f:
            rec = json.load(f)
    if args.variant in ("asis", "both"):
        vps = measure(args.epochs, figures_off=False)
        rec["reference_cpu_vols_per_sec"] = round(vps, 3)
        print(f"as-is: {vps:.3f} vols/s")
    if args.variant in ("figures_off", "both"):
        vps = measure(args.epochs, figures_off=True)
        rec["reference_cpu_vols_per_sec_figures_off"] = round(vps, 3)
        print(f"figures-off: {vps:.3f} vols/s")
    rec["measured_on"] = str(datetime.date.today())
    with open(out, "w") as f:
        json.dump(rec, f, indent=2)
    print(out)


if __name__ == "__main__":
    main()
