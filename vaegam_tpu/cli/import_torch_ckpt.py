"""Convert a reference (PyTorch VAE-GAM) checkpoint into this framework's format.

Usage:
  python -m vaegam_tpu.cli.import_torch_ckpt \
      --torch_ckpt RUN/checkpoint_100.tar --out_ckpt NEW/checkpoint_100.tar

Reads the torch .tar written by the reference's save_state
(vae_reg_GP.py:452-471), ports every layer / the epsilon map / the GP bank
via utils.torch_port, and writes a vaegam_tpu checkpoint that
``--from_ckpt --ckpt_path`` accepts directly.  The Adam optimizer state is
re-initialized (torch and optax moments are not interchangeable — resuming
training restarts the moments; inference is unaffected).

torch is required only by THIS tool (to unpickle the .tar); the framework
itself never imports it.
"""

from __future__ import annotations

import argparse
import os


def build_parser():
    parser = argparse.ArgumentParser(
        description="convert a reference torch checkpoint to vaegam_tpu format"
    )
    parser.add_argument("--torch_ckpt", type=str, required=True,
                        help="Path to the reference checkpoint_*.tar")
    parser.add_argument("--out_ckpt", type=str, required=True,
                        help="Output path for the converted checkpoint")
    parser.add_argument("--nf", type=int, default=8,
                        help="Conv feature multiplier of the saved model (default 8)")
    return parser


def convert(torch_ckpt: str, out_ckpt: str, nf: int = 8) -> None:
    import numpy as np
    import torch

    import jax
    import optax

    from ..models import VAEGAMConfig
    from ..train.checkpoint import save_checkpoint
    from ..utils.torch_port import port_gp_params, port_layer_state
    from ..models.vaegam import hrf_kernel

    state = torch.load(torch_ckpt, map_location="cpu", weights_only=False)

    def to_np(obj):
        if torch.is_tensor(obj):
            return obj.detach().cpu().numpy()
        if isinstance(obj, dict):
            return {k: to_np(v) for k, v in obj.items()}
        return obj

    layer_names = [
        "fc1", "fc2", "fc31", "fc32", "fc33", "fc41", "fc42", "fc43",
        "fc5", "fc6", "fc7", "fc8", "bn1", "bn3", "bn5", "bnt1", "bnt3",
        "bnt5", "conv1", "conv2", "conv3", "conv4", "conv5",
        "convt1", "convt2", "convt3", "convt4", "convt5",
    ]
    layers = {name: to_np(state[name]) for name in layer_names}
    params = port_layer_state(layers, nf=nf)
    params["epsilon"] = np.asarray(to_np(state["epsilon"]), np.float32)
    params["gp"], xu = port_gp_params(to_np(state["gp_params"]))

    num_latents = state["z_dim"] - 9  # z_dim = latents + covariates + 1
    config = VAEGAMConfig(
        nf=nf, num_latents=num_latents,
        num_inducing_pts=int(state["inducing_pts"]),
        gp_kl_scale=float(state["gp_kl_scale"]),
        glm_reg_scale=float(state["glm_reg_scale"]),
    )
    consts = {"xu": xu, "hrf": hrf_kernel(), "glm_maps": None}

    params = jax.tree_util.tree_map(lambda a: np.asarray(a), params)
    tx = optax.adam(float(state.get("lr", 1e-3)))
    opt_state = tx.init(params)

    save_checkpoint(
        out_ckpt, params, opt_state,
        epoch=int(state["epoch"]),
        loss=state.get("loss", {"train": {}, "test": {}}),
        z_dim=int(state["z_dim"]),
        lr=float(state.get("lr", 1e-3)),
        save_dir=os.path.dirname(os.path.abspath(out_ckpt)),
        glm_reg_scale=float(state["glm_reg_scale"]),
        gp_kl_scale=float(state["gp_kl_scale"]),
        inducing_pts=int(state["inducing_pts"]),
        consts=consts,
    )
    print(out_ckpt)


def main(argv=None):
    args = build_parser().parse_args(argv)
    convert(args.torch_ckpt, args.out_ckpt, args.nf)


if __name__ == "__main__":
    main()
