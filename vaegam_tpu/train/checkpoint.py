"""Checkpoint save/resume (reference vae_reg_GP.py:452-539).

Design: a single flat pickle of host numpy pytrees — params, optimizer
state, epoch counter, loss history, and the scalars the reference records.
Filenames keep the reference's ``checkpoint_{epoch:03d}.tar`` convention
(vae_reg_GP.py:712) and load asserts z_dim compatibility (:475).

Unlike torch checkpoints there is no tensor rebinding dance on load
(vae_reg_GP.py:488-539): params ARE the single source of truth pytree, so
restoring them restores gradient flow by construction.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict

import numpy as np

import jax

_FORMAT_VERSION = 1


def checkpoint_filename(epoch: int) -> str:
    return f"checkpoint_{str(epoch).zfill(3)}.tar"


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(
    path: str,
    params: Any,
    opt_state: Any,
    *,
    epoch: int,
    loss: Dict[str, Dict[int, float]],
    z_dim: int,
    lr: float,
    save_dir: str,
    glm_reg_scale: float,
    gp_kl_scale: float,
    inducing_pts: int,
    consts: Any = None,
    rng_key: Any = None,
) -> None:
    state = {
        "format_version": _FORMAT_VERSION,
        "params": _to_numpy(params),
        "optimizer_state": _to_numpy(opt_state),
        "loss": loss,
        "z_dim": z_dim,
        "epoch": epoch,
        "lr": lr,
        "save_dir": save_dir,
        "glm_reg_scale": glm_reg_scale,
        "gp_kl_scale": gp_kl_scale,
        "inducing_pts": inducing_pts,
        "consts": None if consts is None else _to_numpy(consts),
        # trainer PRNG chain at save time: restoring it makes a resumed
        # trajectory continue the unbroken run's key sequence exactly
        "rng_key": None if rng_key is None else np.asarray(rng_key),
    }
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(state, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)  # atomic — a crash mid-save never corrupts the ckpt


def load_checkpoint(path: str, expect_z_dim: int | None = None) -> Dict[str, Any]:
    with open(path, "rb") as f:
        state = pickle.load(f)
    if expect_z_dim is not None:
        assert state["z_dim"] == expect_z_dim, (
            f"checkpoint z_dim {state['z_dim']} != model z_dim {expect_z_dim}"
        )
    return state
