"""Export vaegam_tpu param pytrees back into reference (PyTorch) layout.

The exact inverse of utils.torch_port: lets a user hand a model trained in
this framework back to the reference implementation (dannyfa/VAE-GAM) — its
``load_state`` (vae_reg_GP.py:473-539) accepts the resulting checkpoint
directly — for side-by-side comparison or downstream tooling that still
expects torch checkpoints.

Everything here is plain numpy (this module never imports torch); the
``cli.export_torch_ckpt`` tool wraps the arrays into torch tensors /
nn.Parameters and ``torch.save``s them.

Layout mapping (ours -> torch), inverting torch_port:
  * Conv3d weight DHWIO                      -> (O, I, kD, kH, kW)
  * ConvTranspose3d weight (flipped DHWIO)   -> unflip + (I, O, kD, kH, kW)
  * Linear weight (in, out)                  -> (out, in)
  * encoder fc1 / decoder fc8: undo the channel-minor <-> channel-major
    flatten permutations (torch flattens conv features channel-MAJOR)
  * BatchNorm scale/shift                    -> weight/bias
  * GP bank: unstack the (6,...) motion stacks into the reference's
    per-covariate gp_params dict with its exact shapes
    (sa/logstd (1,1), qu_m (1,P), qu_S (P,P), logkvar/log_ls scalar,
    xu (P,)); a Cholesky-parameterized qu_S is materialized as L L^T.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

_MOTION_KEYS = ("x", "y", "z", "xrot", "yrot", "zrot")
_COV_KEYS = ("task", "x", "y", "z", "xrot", "yrot", "zrot", "sex")


def _np(a) -> np.ndarray:
    return np.asarray(a, np.float32)


def _conv_w_inv(w) -> np.ndarray:
    """(kD, kH, kW, I, O) -> (O, I, kD, kH, kW)."""
    return np.ascontiguousarray(np.transpose(_np(w), (4, 3, 0, 1, 2)))


def _convt_w_inv(w) -> np.ndarray:
    """Flipped (kD, kH, kW, I, O) -> (I, O, kD, kH, kW)."""
    unflipped = _np(w)[::-1, ::-1, ::-1]
    return np.ascontiguousarray(np.transpose(unflipped, (3, 4, 0, 1, 2)))


def _linear_inv(p) -> Dict[str, np.ndarray]:
    return {"weight": np.ascontiguousarray(_np(p["w"]).T),
            "bias": _np(p["b"])}


def _conv_inv(p, transpose: bool) -> Dict[str, np.ndarray]:
    w = _convt_w_inv(p["w"]) if transpose else _conv_w_inv(p["w"])
    return {"weight": w, "bias": _np(p["b"])}


def _bn_inv(p) -> Dict[str, np.ndarray]:
    return {"weight": _np(p["scale"]), "bias": _np(p["shift"])}


def export_layer_state(params: Dict[str, Any], nf: int
                       ) -> Dict[str, Dict[str, np.ndarray]]:
    """Our {enc, dec} param trees -> reference per-layer state dicts.

    Inverse of torch_port.port_layer_state; output keys/shapes match
    ``VAE._get_layers()[name].state_dict()`` (vae_reg_GP.py:452-456).
    """
    enc, dec = params["enc"], params["dec"]
    out = {
        "conv1": _conv_inv(enc["conv1"], False),
        "conv2": _conv_inv(enc["conv2"], False),
        "conv3": _conv_inv(enc["conv3"], False),
        "conv4": _conv_inv(enc["conv4"], False),
        "conv5": _conv_inv(enc["conv5"], False),
        "bn1": _bn_inv(enc["bn1"]),
        "bn3": _bn_inv(enc["bn3"]),
        "bn5": _bn_inv(enc["bn5"]),
        "fc2": _linear_inv(enc["fc2"]),
        "fc31": _linear_inv(enc["fc31"]),
        "fc32": _linear_inv(enc["fc32"]),
        "fc33": _linear_inv(enc["fc33"]),
        "fc41": _linear_inv(enc["fc41"]),
        "fc42": _linear_inv(enc["fc42"]),
        "fc43": _linear_inv(enc["fc43"]),
        "fc5": _linear_inv(dec["fc5"]),
        "fc6": _linear_inv(dec["fc6"]),
        "fc7": _linear_inv(dec["fc7"]),
        "convt1": _conv_inv(dec["convt1"], True),
        "convt2": _conv_inv(dec["convt2"], True),
        "convt3": _conv_inv(dec["convt3"], True),
        "convt4": _conv_inv(dec["convt4"], True),
        "convt5": _conv_inv(dec["convt5"], True),
        "bnt1": _bn_inv(dec["bnt1"]),
        "bnt3": _bn_inv(dec["bnt3"]),
        "bnt5": _bn_inv(dec["bnt5"]),
    }

    # fc1: permute input columns back to torch's channel-MAJOR flatten
    # (spatial size derived from the weight, so shape-general checkpoints
    # export consistently; 6*8*4 = 192 at the reference grid)
    c = 2 * nf
    w = _np(enc["fc1"]["w"])  # (in, 200), in = spatial-major/channel-minor
    spatial = w.shape[0] // c
    w = w.reshape(spatial, c, -1).transpose(1, 0, 2).reshape(c * spatial, -1)
    out["fc1"] = {"weight": np.ascontiguousarray(w.T),
                  "bias": _np(enc["fc1"]["b"])}

    # fc8: permute OUTPUT rows + bias back to channel-major (6*8*5 = 240 at
    # the reference grid — the reference's deliberate seed asymmetry)
    w = _np(dec["fc8"]["w"])  # (200, out), out = spatial-major
    spatial = w.shape[1] // c
    w = w.reshape(w.shape[0], spatial, c).transpose(0, 2, 1).reshape(
        w.shape[0], c * spatial
    )
    b = _np(dec["fc8"]["b"]).reshape(spatial, c).T.reshape(-1)
    out["fc8"] = {"weight": np.ascontiguousarray(w.T),
                  "bias": np.ascontiguousarray(b)}
    return out


def export_gp_params(gp: Dict[str, Any], xu: Any
                     ) -> Dict[str, Dict[str, np.ndarray]]:
    """Our stacked GP bank + consts['xu'] -> reference gp_params dict.

    Inverse of torch_port.port_gp_params.  A Cholesky-parameterized bank
    ('qu_S_raw') is materialized to the dense PSD qu_S = L L^T the
    reference expects (vae_reg_GP.py:82 stores the raw matrix).
    """
    from ..models.vaegam import resolve_qu_S

    sa = _np(gp["sa"])          # (8,)
    logstd = _np(gp["logstd"])  # (8,)
    qu_m = _np(gp["qu_m"])      # (6, P)
    qu_S = np.asarray(resolve_qu_S(gp), np.float32)  # (6, P, P)
    logkvar = _np(gp["logkvar"])  # (6,)
    log_ls = _np(gp["log_ls"])    # (6,)
    xu = _np(xu)                  # (6, P)

    out: Dict[str, Dict[str, np.ndarray]] = {}
    for i, cov in enumerate(_COV_KEYS):
        out[cov] = {
            "sa": sa[i].reshape(1, 1),
            "logstd": logstd[i].reshape(1, 1),
        }
    for j, cov in enumerate(_MOTION_KEYS):
        out[cov].update(
            xu=xu[j],
            qu_m=qu_m[j].reshape(1, -1),
            qu_S=qu_S[j],
            logkvar=logkvar[j].reshape(()),
            log_ls=log_ls[j].reshape(()),
        )
    return out
