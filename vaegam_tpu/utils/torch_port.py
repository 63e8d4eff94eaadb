"""Port reference (PyTorch VAE-GAM) weights into vaegam_tpu param pytrees.

Lets a user of the reference (dannyfa/VAE-GAM) bring an existing trained
checkpoint (vae_reg_GP.py:452-471 format) into this framework, and powers
the numerical-parity test suite (same weights -> same outputs within fp32).

Layout mapping (torch -> ours):
  * Conv3d weight (O, I, kD, kH, kW)          -> DHWIO transpose
  * ConvTranspose3d weight (I, O, kD, kH, kW) -> DHWIO transpose + SPATIAL
    FLIP: torch's transposed conv is the adjoint of a correlation, which
    equals a correlation with the spatially flipped kernel (our transposed
    convs are plain fractionally-strided correlations, networks.py:_conv_t)
  * Linear weight (out, in)                   -> (in, out) transpose
  * encoder fc1: torch flattens conv features channel-MAJOR (B, C, 6,8,4)
    while we flatten channel-minor (B, 6,8,4, C) -> permute input columns
  * decoder fc8: same permutation on the OUTPUT side (rows + bias)
  * BatchNorm3d weight/bias                   -> scale/shift (direct)
  * epsilon, gp_params                        -> direct (stacked for motion)

All inputs are plain numpy arrays (a torch checkpoint can be converted with
``{k: v.detach().cpu().numpy() ...}``), so the framework itself never
imports torch.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

import jax.numpy as jnp

_MOTION_KEYS = ("x", "y", "z", "xrot", "yrot", "zrot")
_COV_KEYS = ("task", "x", "y", "z", "xrot", "yrot", "zrot", "sex")


def _conv_w(w: np.ndarray) -> np.ndarray:
    """(O, I, kD, kH, kW) -> (kD, kH, kW, I, O)."""
    return np.transpose(w, (2, 3, 4, 1, 0))


def _convt_w(w: np.ndarray) -> np.ndarray:
    """(I, O, kD, kH, kW) -> flipped (kD, kH, kW, I, O)."""
    return np.transpose(w, (2, 3, 4, 0, 1))[::-1, ::-1, ::-1]


def _linear(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    return {"w": jnp.asarray(sd["weight"].T), "b": jnp.asarray(sd["bias"])}


def _conv(sd: Dict[str, np.ndarray], transpose: bool) -> Dict[str, Any]:
    w = _convt_w(sd["weight"]) if transpose else _conv_w(sd["weight"])
    return {"w": jnp.asarray(np.ascontiguousarray(w)),
            "b": jnp.asarray(sd["bias"])}


def _bn(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    return {"scale": jnp.asarray(sd["weight"]), "shift": jnp.asarray(sd["bias"])}


def _chan_major_to_minor_cols(w_t: np.ndarray, c: int, spatial: int) -> np.ndarray:
    """Permute fc input columns from torch's (C, spatial) flatten to ours.

    w_t: (in, out) with in = C*spatial indexed channel-major.
    Returns (in, out) indexed spatial-major/channel-minor.
    """
    return w_t.reshape(c, spatial, -1).transpose(1, 0, 2).reshape(c * spatial, -1)


def port_layer_state(layers: Dict[str, Dict[str, np.ndarray]], nf: int
                     ) -> Dict[str, Any]:
    """Map the reference's per-layer state dicts into enc/dec param trees.

    ``layers`` is state[layer_name] from the reference checkpoint
    (vae_reg_GP.py:452-456), values already as numpy arrays.
    """
    enc = {
        "conv1": _conv(layers["conv1"], False),
        "conv2": _conv(layers["conv2"], False),
        "conv3": _conv(layers["conv3"], False),
        "conv4": _conv(layers["conv4"], False),
        "conv5": _conv(layers["conv5"], False),
        "bn1": _bn(layers["bn1"]),
        "bn3": _bn(layers["bn3"]),
        "bn5": _bn(layers["bn5"]),
        "fc2": _linear(layers["fc2"]),
        "fc31": _linear(layers["fc31"]),
        "fc32": _linear(layers["fc32"]),
        "fc33": _linear(layers["fc33"]),
        "fc41": _linear(layers["fc41"]),
        "fc42": _linear(layers["fc42"]),
        "fc43": _linear(layers["fc43"]),
    }
    # fc1: permute input columns (C-major torch flatten -> C-minor ours)
    fc1_w = layers["fc1"]["weight"].T  # (in, 200)
    enc["fc1"] = {
        "w": jnp.asarray(_chan_major_to_minor_cols(fc1_w, 2 * nf, 6 * 8 * 4)),
        "b": jnp.asarray(layers["fc1"]["bias"]),
    }

    dec = {
        "fc5": _linear(layers["fc5"]),
        "fc6": _linear(layers["fc6"]),
        "fc7": _linear(layers["fc7"]),
        "convt1": _conv(layers["convt1"], True),
        "convt2": _conv(layers["convt2"], True),
        "convt3": _conv(layers["convt3"], True),
        "convt4": _conv(layers["convt4"], True),
        "convt5": _conv(layers["convt5"], True),
        "bnt1": _bn(layers["bnt1"]),
        "bnt3": _bn(layers["bnt3"]),
        "bnt5": _bn(layers["bnt5"]),
    }
    # fc8: permute OUTPUT rows (torch reshapes its output channel-major)
    fc8_w = layers["fc8"]["weight"].T  # (200, out) out = C*6*8*5 C-major
    c, spatial = 2 * nf, 6 * 8 * 5
    fc8_w = fc8_w.reshape(-1, c, spatial).transpose(0, 2, 1).reshape(
        fc8_w.shape[0], c * spatial
    )
    fc8_b = layers["fc8"]["bias"].reshape(c, spatial).T.reshape(-1)
    dec["fc8"] = {"w": jnp.asarray(fc8_w), "b": jnp.asarray(fc8_b)}
    return {"enc": enc, "dec": dec}


def port_gp_params(gp_params: Dict[str, Dict[str, np.ndarray]]) -> Dict[str, Any]:
    """Reference gp_params dict (vae_reg_GP.py:68-172) -> stacked GP bank."""
    sa = np.stack([np.asarray(gp_params[k]["sa"]).reshape(()) for k in _COV_KEYS])
    logstd = np.stack(
        [np.asarray(gp_params[k]["logstd"]).reshape(()) for k in _COV_KEYS]
    )
    qu_m = np.stack(
        [np.asarray(gp_params[k]["qu_m"]).reshape(-1) for k in _MOTION_KEYS]
    )
    qu_S = np.stack([np.asarray(gp_params[k]["qu_S"]) for k in _MOTION_KEYS])
    logkvar = np.stack(
        [np.asarray(gp_params[k]["logkvar"]).reshape(()) for k in _MOTION_KEYS]
    )
    log_ls = np.stack(
        [np.asarray(gp_params[k]["log_ls"]).reshape(()) for k in _MOTION_KEYS]
    )
    xu = np.stack([np.asarray(gp_params[k]["xu"]) for k in _MOTION_KEYS])
    gp = {
        "sa": jnp.asarray(sa, jnp.float32),
        "logstd": jnp.asarray(logstd, jnp.float32),
        "qu_m": jnp.asarray(qu_m, jnp.float32),
        "qu_S": jnp.asarray(qu_S, jnp.float32),
        "logkvar": jnp.asarray(logkvar, jnp.float32),
        "log_ls": jnp.asarray(log_ls, jnp.float32),
    }
    return gp, jnp.asarray(xu, jnp.float32)


def port_reference_checkpoint(state: Dict[str, Any], nf: int = 8):
    """Full reference checkpoint dict (numpy-converted) -> (params, xu).

    ``state`` must contain the per-layer state dicts, 'epsilon', and
    'gp_params' as written by vae_reg_GP.save_state (values as numpy).
    """
    params = port_layer_state(state, nf)
    params["epsilon"] = jnp.asarray(np.asarray(state["epsilon"]), jnp.float32)
    params["gp"], xu = port_gp_params(state["gp_params"])
    return params, xu
