"""Convert a vaegam_tpu checkpoint into the reference's torch format.

Usage:
  python -m vaegam_tpu.cli.export_torch_ckpt \
      --ckpt RUN/checkpoint_100.tar --out_ckpt REF_RUN/checkpoint_100.tar

The inverse of cli.import_torch_ckpt: writes a ``torch.save`` .tar that the
reference's ``VAE.load_state`` (vae_reg_GP.py:473-539) accepts directly —
per-layer state dicts, float64 epsilon nn.Parameter, the per-covariate
gp_params dict (nn.Parameters so gradients flow on resumed reference
training), the bookkeeping scalars, and a fresh Adam ``optimizer_state``
with the matching parameter count (torch and optax moments are not
interchangeable — resuming in the reference restarts the moments, same
caveat as the import direction; inference is unaffected).

torch is required only by THIS tool; the framework itself never imports it.
"""

from __future__ import annotations

import argparse


def build_parser():
    parser = argparse.ArgumentParser(
        description="convert a vaegam_tpu checkpoint to the reference's "
                    "torch format"
    )
    parser.add_argument("--ckpt", type=str, required=True,
                        help="Path to the vaegam_tpu checkpoint_*.tar")
    parser.add_argument("--out_ckpt", type=str, required=True,
                        help="Output path for the torch checkpoint")
    return parser


def convert(ckpt: str, out_ckpt: str) -> None:
    import os

    import numpy as np
    import torch

    from ..train.checkpoint import load_checkpoint
    from ..utils.torch_export import export_gp_params, export_layer_state

    state = load_checkpoint(ckpt)
    params = state["params"]
    if state.get("consts") is None or "xu" not in state["consts"]:
        raise ValueError(
            f"{ckpt} carries no consts['xu'] (inducing-point locations); "
            "only checkpoints written by this framework's Trainer are "
            "exportable"
        )
    nf = int(np.asarray(params["enc"]["conv1"]["w"]).shape[-1])

    def t(a):
        # .copy(): contiguous + writable, and (unlike ascontiguousarray)
        # preserves 0-d shapes (the reference's logkvar/log_ls are scalars)
        return torch.from_numpy(np.asarray(a).copy())

    layers = export_layer_state(params, nf)
    out = {
        name: {k: t(v) for k, v in sd.items()}
        for name, sd in layers.items()
    }
    # the reference stores epsilon as a float64 nn.Parameter
    # (vae_reg_GP.py:54-56) and assigns it straight from the checkpoint
    out["epsilon"] = torch.nn.Parameter(t(params["epsilon"]).double())
    out["gp_params"] = {
        cov: {
            k: (t(v) if k == "xu" else torch.nn.Parameter(t(v)))
            for k, v in d.items()
        }
        for cov, d in export_gp_params(
            params["gp"], state["consts"]["xu"]
        ).items()
    }
    # plain python ints/floats: the reference loads with torch.load's
    # default weights_only=True (torch >= 2.6), which rejects numpy scalars
    out["loss"] = {
        split: {int(k): float(v) for k, v in d.items()}
        for split, d in state.get("loss",
                                  {"train": {}, "test": {}}).items()
    }
    out["z_dim"] = int(state["z_dim"])
    out["epoch"] = int(state["epoch"])
    out["lr"] = float(state.get("lr", 1e-3))
    out["save_dir"] = os.path.dirname(os.path.abspath(out_ckpt))
    out["glm_reg_scale"] = float(state["glm_reg_scale"])
    out["gp_kl_scale"] = float(state["gp_kl_scale"])
    out["inducing_pts"] = int(state["inducing_pts"])

    # fresh Adam state over the same parameter count, so the reference's
    # optimizer.load_state_dict (vae_reg_GP.py:480) accepts it: one slot per
    # exported layer tensor + epsilon + every gp nn.Parameter (xu is a plain
    # buffer in the reference, vae_reg_GP.py:78)
    n_params = (
        sum(len(sd) for sd in layers.values())
        + 1  # epsilon
        + sum(1 for d in out["gp_params"].values()
              for k in d if k != "xu")
    )
    dummies = [torch.nn.Parameter(torch.zeros(1)) for _ in range(n_params)]
    out["optimizer_state"] = torch.optim.Adam(dummies, lr=out["lr"]).state_dict()

    d = os.path.dirname(os.path.abspath(out_ckpt))
    os.makedirs(d, exist_ok=True)
    torch.save(out, out_ckpt)
    print(out_ckpt)


def main(argv=None):
    args = build_parser().parse_args(argv)
    convert(args.ckpt, args.out_ckpt)


if __name__ == "__main__":
    main()
